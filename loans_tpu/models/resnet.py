"""Scratch ResNet family, NHWC, flax.linen.

Re-design of ``sheep/resnet.py`` (configurable ResNet-{18,19,20,32,34,44,
50,56,101,110,152} built from scratch) for TPU: NHWC layout, optional
bfloat16 compute dtype with float32 params/BN, statically-known
architecture (no hasattr-driven control flow).

Architectural quirks preserved from the reference:
  * every stage's first block (``BasicA``/``BottleNeckA``) has a
    *projection* shortcut even at stride 1 (``sheep/resnet.py:121-141``);
    ``BasicA``'s projection is a full 3x3 conv, not 1x1;
  * the stem max-pool is chainer's ``cover_all`` mode (3x3/2, implicit
    bottom/right padding), which yields 56x56 from 224 inputs;
  * BatchNorm uses chainer defaults (decay 0.9, eps 2e-5);
  * bottleneck downsampling strides live on the first 1x1 conv
    (caffe-style), matching chainer's pretrained ResNet50Layers.

Each block ``sow``s the channel-mean of its main-branch conv inputs into
the ``vbp`` collection for VisualBackprop (see ``insights/visual_backprop``);
the matching static conv geometry comes from ``vbp_ladder``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# (kernel, stride, pad) of the stem conv and pool; used by VisualBackprop.
STEM_LADDER = (
    ("conv", 7, 2, 3),
    ("pool", 3, 2, 0),
)

BLOCK_CONFIGS: dict[int, Sequence[int]] = {
    18: (2, 2, 2, 2),
    19: (2, 2, 2, 2),
    20: (2, 2, 2, 2, 2, 2),
    32: (5, 5, 5),
    34: (3, 4, 6, 3),
    44: (7, 7, 7),
    50: (3, 4, 6, 3),
    56: (9, 9, 9),
    101: (3, 4, 23, 3),
    110: (18, 18, 18),
    152: (3, 4, 36, 3),
}

_BASIC = (18, 20, 34)
_SMALL = (32, 44, 56, 110)
_BOTTLENECK = (19, 50, 101, 152)

_he = nn.initializers.he_normal()


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, chainer BN defaults.

    ``norm_dtype=None`` runs BatchNorm in the compute dtype (bf16 on the
    fast path; running stats and scale/bias stay float32 as params) —
    keeping activations in bf16 end-to-end halves BN HBM traffic.
    ``norm_dtype=jnp.float32`` is the conservative default."""

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    dtype: Any = jnp.float32
    use_bias: bool = False
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad)] * 2,
            use_bias=self.use_bias,
            kernel_init=_he,
            dtype=self.dtype,
        )(x)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=2e-5,
            dtype=self.norm_dtype,
        )(x)


class BasicA(nn.Module):
    """First block of a basic stage: 3x3-3x3 main branch + 3x3 projection
    shortcut (``sheep/resnet.py:121-141``)."""

    ch: int
    stride: int = 2
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        nd = self.norm_dtype
        self.sow("vbp", "in0", jnp.mean(x, axis=-1, keepdims=True))
        h1 = nn.relu(
            ConvBN(self.ch, 3, self.stride, 1, self.dtype, norm_dtype=nd)(x, train)
        )
        self.sow("vbp", "in1", jnp.mean(h1, axis=-1, keepdims=True))
        h1 = ConvBN(self.ch, 3, 1, 1, self.dtype, norm_dtype=nd)(h1, train)
        h2 = ConvBN(self.ch, 3, self.stride, 1, self.dtype, norm_dtype=nd)(x, train)
        return nn.relu(h1 + h2)


class BasicB(nn.Module):
    """Identity basic block (``sheep/resnet.py:144-160``)."""

    ch: int
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        nd = self.norm_dtype
        self.sow("vbp", "in0", jnp.mean(x, axis=-1, keepdims=True))
        h = nn.relu(ConvBN(self.ch, 3, 1, 1, self.dtype, norm_dtype=nd)(x, train))
        self.sow("vbp", "in1", jnp.mean(h, axis=-1, keepdims=True))
        h = ConvBN(self.ch, 3, 1, 1, self.dtype, norm_dtype=nd)(h, train)
        return nn.relu(h + x)


class BottleNeckA(nn.Module):
    """First bottleneck of a stage: 1x1(s)-3x3-1x1 + 1x1(s) projection
    (``sheep/resnet.py:163-191``, caffe-style stride placement)."""

    ch: int
    out_ch: int
    stride: int = 2
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        nd = self.norm_dtype
        self.sow("vbp", "in0", jnp.mean(x, axis=-1, keepdims=True))
        h1 = nn.relu(
            ConvBN(self.ch, 1, self.stride, 0, self.dtype, norm_dtype=nd)(x, train)
        )
        self.sow("vbp", "in1", jnp.mean(h1, axis=-1, keepdims=True))
        h1 = nn.relu(ConvBN(self.ch, 3, 1, 1, self.dtype, norm_dtype=nd)(h1, train))
        self.sow("vbp", "in2", jnp.mean(h1, axis=-1, keepdims=True))
        h1 = ConvBN(self.out_ch, 1, 1, 0, self.dtype, norm_dtype=nd)(h1, train)
        h2 = ConvBN(self.out_ch, 1, self.stride, 0, self.dtype, norm_dtype=nd)(x, train)
        return nn.relu(h1 + h2)


class BottleNeckB(nn.Module):
    """Identity bottleneck (``sheep/resnet.py:194-216``)."""

    ch: int
    out_ch: int
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        nd = self.norm_dtype
        self.sow("vbp", "in0", jnp.mean(x, axis=-1, keepdims=True))
        h = nn.relu(ConvBN(self.ch, 1, 1, 0, self.dtype, norm_dtype=nd)(x, train))
        self.sow("vbp", "in1", jnp.mean(h, axis=-1, keepdims=True))
        h = nn.relu(ConvBN(self.ch, 3, 1, 1, self.dtype, norm_dtype=nd)(h, train))
        self.sow("vbp", "in2", jnp.mean(h, axis=-1, keepdims=True))
        h = ConvBN(self.out_ch, 1, 1, 0, self.dtype, norm_dtype=nd)(h, train)
        return nn.relu(h + x)


class BasicStage(nn.Module):
    """Stage of basic blocks (``BasicBlock`` chainlist in the reference)."""

    n_blocks: int
    ch: int
    stride: int = 2
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = BasicA(self.ch, self.stride, self.dtype, self.norm_dtype)(x, train)
        for _ in range(self.n_blocks - 1):
            x = BasicB(self.ch, self.dtype, self.norm_dtype)(x, train)
        return x


class BottleNeckStage(nn.Module):
    """Stage of bottleneck blocks."""

    n_blocks: int
    ch: int
    out_ch: int
    stride: int = 2
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = BottleNeckA(
            self.ch, self.out_ch, self.stride, self.dtype, self.norm_dtype
        )(x, train)
        for _ in range(self.n_blocks - 1):
            x = BottleNeckB(
                self.ch, self.out_ch, self.dtype, self.norm_dtype
            )(x, train)
        return x


def _cover_all_max_pool(x, window: int, stride: int):
    """chainer ``max_pooling_2d(cover_all=True)``: implicit bottom/right
    padding so every input pixel is covered."""
    return nn.max_pool(
        x,
        (window, window),
        strides=(stride, stride),
        padding=((0, stride - 1), (0, stride - 1)),
    )


class ResNet(nn.Module):
    """Configurable scratch ResNet feature extractor / classifier.

    Mirrors ``sheep/resnet.py:6-89``: returns the res5 (or res4 for the
    small variants) feature map; with ``class_labels`` set, global-pools
    and classifies (``train_imagenet`` mode).
    """

    n_layers: int = 18
    class_labels: int | None = None
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    def _stages(self):
        blocks = BLOCK_CONFIGS[self.n_layers]
        nd = self.norm_dtype
        if self.n_layers in _BASIC:
            chs = (64, 128, 256, 512)
            strides = (1, 2, 2, 2)
            return [
                BasicStage(b, ch, s, self.dtype, nd)
                for b, ch, s in zip(blocks[:4], chs, strides)
            ] + (
                [
                    BasicStage(blocks[4], 512, 2, self.dtype, nd),
                    BasicStage(blocks[5], 512, 2, self.dtype, nd),
                ]
                if self.n_layers == 20
                else []
            )
        if self.n_layers in _SMALL:
            chs = (16, 32, 64)
            strides = (1, 2, 2)
            return [
                BasicStage(b, ch, s, self.dtype, nd)
                for b, ch, s in zip(blocks, chs, strides)
            ]
        mids = (64, 128, 256, 512)
        outs = (256, 512, 1024, 2048)
        strides = (1, 2, 2, 2)
        return [
            BottleNeckStage(b, mid, out, s, self.dtype, nd)
            for b, mid, out, s in zip(blocks, mids, outs, strides)
        ]

    @nn.compact
    def __call__(self, x, train: bool = True):
        stem_ch = 16 if self.n_layers in _SMALL else 64
        self.sow("vbp", "in0", jnp.mean(x, axis=-1, keepdims=True))
        h = nn.Conv(
            stem_ch,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,  # BN follows; matches torch/chainer resnets
            kernel_init=_he,
            dtype=self.dtype,
        )(x)
        h = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=2e-5,
            dtype=self.norm_dtype,
        )(h)
        h = nn.relu(h)
        self.sow("vbp", "in1", jnp.mean(h, axis=-1, keepdims=True))
        h = _cover_all_max_pool(h, 3, 2)
        for stage in self._stages():
            h = stage(h, train)
        if self.class_labels is not None or self.n_layers == 20:
            h = jnp.mean(h, axis=(1, 2))
        if self.class_labels is not None:
            h = nn.Dense(self.class_labels, dtype=self.dtype)(h)
        return h

    @property
    def feature_dim(self) -> int:
        if self.n_layers in _BASIC or self.n_layers == 20:
            return 512
        if self.n_layers in _SMALL:
            return 64
        return 2048


def _basic_block_ladder(stride):
    return [("conv", 3, stride, 1), ("conv", 3, 1, 1)]


def _bottleneck_block_ladder(stride):
    return [("conv", 1, stride, 0), ("conv", 3, 1, 1), ("conv", 1, 1, 0)]


def _stage_ladder(n_blocks, stride, bottleneck):
    block = _bottleneck_block_ladder if bottleneck else _basic_block_ladder
    steps = block(stride)
    for _ in range(n_blocks - 1):
        steps.extend(block(1))
    return steps


def resnet_vbp_ladder(n_layers: int):
    """Static (kind, kernel, stride, pad) ladder from input to the
    feature map, following the main branch like the reference's autograd
    graph walk (``insights/visual_backprop.py:16-22``). Pure function of
    the architecture config — no module instantiation needed."""
    blocks = BLOCK_CONFIGS[n_layers]
    steps = list(STEM_LADDER)
    bottleneck = n_layers in _BOTTLENECK
    if n_layers in _SMALL:
        strides = (1, 2, 2)
    else:
        strides = (1, 2, 2, 2) + (2, 2) * (n_layers == 20)
    for n, s in zip(blocks, strides):
        steps.extend(_stage_ladder(n, s, bottleneck))
    return tuple(steps)
