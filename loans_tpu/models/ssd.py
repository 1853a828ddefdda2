"""SSD300 / SSD512 single-shot detector (supervised baseline).

Re-design of the reference's supervised baseline, which consumes
chainercv's SSD300/SSD512 models (``schaaaafrichter/train.py:138-147``,
VGG16 backbone, ``n_fg_class=1``): VGG16 through conv5_3, fc6/fc7 as
atrous convs, extra feature layers, L2-normalized conv4_3 source, and a
multibox head over 6 (SSD300) / 7 (SSD512) feature scales.

TPU-first: NHWC, statically-shaped multibox outputs ``(N, K, 4)`` /
``(N, K, C+1)`` concatenated across scales inside jit (decode + NMS gate
run outside, ``ops/multibox.py``), optional bfloat16 compute.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from loans_tpu.ops.multibox import MultiboxCoder, default_boxes

_he = nn.initializers.he_normal()


class L2Norm(nn.Module):
    """Channelwise L2 normalization with learnable scale (conv4_3)."""

    scale_init: float = 20.0

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, self.scale_init),
            (x.shape[-1],),
        )
        norm = jnp.sqrt(
            jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-12
        )
        return x / norm * scale


def _conv(ch, k, stride=1, pad=None, dilation=1, dtype=jnp.float32):
    if pad is None:
        pad = k // 2
    return nn.Conv(
        ch,
        (k, k),
        strides=(stride, stride),
        padding=[(pad, pad)] * 2,
        kernel_dilation=(dilation, dilation),
        kernel_init=_he,
        dtype=dtype,
    )


class VGG16Extractor(nn.Module):
    """VGG16 feature extractor with SSD modifications.

    Sources: conv4_3 (L2-normalized) and conv7 (atrous fc7); SSD512 pads
    pool3 chainer-style via ``cover_all`` pooling handled by exact /2
    shapes (inputs are 300 or 512, both divisible enough).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def block(x, ch, n, pool_ceil=False):
            for _ in range(n):
                x = nn.relu(_conv(ch, 3, dtype=self.dtype)(x))
            return x

        def pool(x, ceil=False):
            pad = ((0, 1), (0, 1)) if ceil else ((0, 0), (0, 0))
            return nn.max_pool(x, (2, 2), strides=(2, 2), padding=pad)

        x = block(x, 64, 2)
        x = pool(x)
        x = block(x, 128, 2)
        x = pool(x)
        x = block(x, 256, 3)
        # ceil-mode pool3 (75 -> 38 for SSD300)
        x = pool(x, ceil=(x.shape[1] % 2 == 1))
        x = block(x, 512, 3)
        conv4_3 = L2Norm()(x.astype(jnp.float32)).astype(self.dtype)
        x = pool(x)
        x = block(x, 512, 3)
        # pool5: 3x3 stride 1
        x = nn.max_pool(
            x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1))
        )
        # fc6: atrous 3x3 dilation 6; fc7: 1x1
        x = nn.relu(_conv(1024, 3, pad=6, dilation=6, dtype=self.dtype)(x))
        conv7 = nn.relu(_conv(1024, 1, pad=0, dtype=self.dtype)(x))
        return conv4_3, conv7


class ExtraLayers(nn.Module):
    """conv8..conv11(+conv12 for 512) downsampling feature pyramid."""

    input_size: int = 300
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        sources = []
        if self.input_size == 300:
            specs = [
                (256, 512, 2, 1),  # conv8: 19 -> 10
                (128, 256, 2, 1),  # conv9: 10 -> 5
                (128, 256, 1, 0),  # conv10: 5 -> 3
                (128, 256, 1, 0),  # conv11: 3 -> 1
            ]
        else:
            specs = [
                (256, 512, 2, 1),  # conv8: 32 -> 16
                (128, 256, 2, 1),  # conv9: 16 -> 8
                (128, 256, 2, 1),  # conv10: 8 -> 4
                (128, 256, 2, 1),  # conv11: 4 -> 2
                (128, 256, 2, 1),  # conv12: 2 -> 1
            ]
        for mid, out, stride, pad in specs:
            x = nn.relu(_conv(mid, 1, pad=0, dtype=self.dtype)(x))
            x = nn.relu(
                _conv(out, 3, stride=stride, pad=pad, dtype=self.dtype)(x)
            )
            sources.append(x)
        return sources


class Multibox(nn.Module):
    """Per-scale loc/conf heads -> concatenated (N, K, ·) outputs."""

    n_fg_class: int
    aspect_ratios: Sequence[tuple[int, ...]]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sources):
        locs, confs = [], []
        for i, x in enumerate(sources):
            n_box = 2 + 2 * len(self.aspect_ratios[i])
            loc = _conv(n_box * 4, 3, dtype=self.dtype)(x)
            conf = _conv(
                n_box * (self.n_fg_class + 1), 3, dtype=self.dtype
            )(x)
            n = x.shape[0]
            locs.append(loc.reshape(n, -1, 4))
            confs.append(conf.reshape(n, -1, self.n_fg_class + 1))
        return (
            jnp.concatenate(locs, axis=1).astype(jnp.float32),
            jnp.concatenate(confs, axis=1).astype(jnp.float32),
        )


_SSD300_SPEC = dict(
    input_size=300,
    grids=(38, 19, 10, 5, 3, 1),
    steps=(8, 16, 32, 64, 100, 300),
    sizes=(30, 60, 111, 162, 213, 264, 315),
    aspect_ratios=((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)),
)
_SSD512_SPEC = dict(
    input_size=512,
    grids=(64, 32, 16, 8, 4, 2, 1),
    steps=(8, 16, 32, 64, 128, 256, 512),
    sizes=(35.84, 76.8, 153.6, 230.4, 307.2, 384.0, 460.8, 537.6),
    aspect_ratios=((2,), (2, 3), (2, 3), (2, 3), (2, 3), (2,), (2,)),
)


class SSD(nn.Module):
    """Full SSD: images (N, S, S, 3) in [0,1] -> (mb_loc, mb_conf)."""

    n_fg_class: int = 1
    input_size: int = 300
    dtype: Any = jnp.float32

    @property
    def spec(self) -> dict:
        return _SSD300_SPEC if self.input_size == 300 else _SSD512_SPEC

    @property
    def grids(self):
        return self.spec["grids"]

    def default_bbox(self) -> np.ndarray:
        s = self.spec
        return default_boxes(
            s["input_size"], s["grids"], s["steps"], s["sizes"],
            s["aspect_ratios"],
        )

    def coder(self) -> MultiboxCoder:
        return MultiboxCoder(self.default_bbox())

    @nn.compact
    def __call__(self, images, train: bool = True):
        del train  # no BN anywhere in SSD-VGG
        # VGG mean subtraction (caffe-style, RGB order)
        mean = jnp.asarray(
            [123.68, 116.779, 103.939], dtype=images.dtype
        )
        x = (images * 255.0 - mean).astype(self.dtype)
        conv4_3, conv7 = VGG16Extractor(dtype=self.dtype)(x)
        sources = [conv4_3, conv7]
        sources += ExtraLayers(self.input_size, dtype=self.dtype)(conv7)
        return Multibox(
            self.n_fg_class, self.spec["aspect_ratios"], dtype=self.dtype
        )(sources)


def SSD300(n_fg_class: int = 1, dtype=jnp.float32) -> SSD:
    return SSD(n_fg_class=n_fg_class, input_size=300, dtype=dtype)


def SSD512(n_fg_class: int = 1, dtype=jnp.float32) -> SSD:
    return SSD(n_fg_class=n_fg_class, input_size=512, dtype=dtype)
