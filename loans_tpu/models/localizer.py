"""Localizer: backbone + affine-param head + differentiable STN crop.

Re-design of ``sheep/sheep_localizer.py`` (``SheepLocalizer`` /
``Resnet50SheepLocalizer``). TPU-first changes vs. the reference:

  * Preprocessing is a fused elementwise op on-device (x*255 - ImageNet
    mean, RGB order). The reference round-trips every batch through the
    host to run chainer's ``resnet.prepare`` (``sheep_localizer.py:72-82``,
    a GPU->CPU->GPU copy per iteration); for pretrained caffe-style
    weights the BGR channel permutation is folded into weight import
    instead (``tools/import_resnet50.py``).
  * The sampling grid is never materialized: the head returns theta
    (N, 2, 3) and the crop is computed by the separable MXU sampler
    (``ops/stn.py``), legal because ``rotation_dropout(ratio=0.0)``
    statically zeroes the off-diagonals. Nonzero ratios use the dense
    rotated sampler (per-row MXU contractions, no gathers).
  * Whether the extra ``res6``/``res7`` stages exist is decided by the
    static ``input_size`` config (``sheep_localizer.py:51-55`` switches on
    runtime shape, which would retrace under jit).

Head init mirrors ``sheep_localizer.py:28-33``: zero weights, bias
[0.8, 0, 0, 0, 0.8, 0] — the localizer starts at a centered 0.8-scale
axis-aligned crop.

Grayscale note: the reference's RGB->gray path unpacks RGB channels into
variables named (b, g, r) and therefore computes 0.299*B+0.587*G+0.114*R
(``sheep_localizer.py:65-68``); this implementation uses the standard
luma 0.299*R+0.587*G+0.114*B.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from loans_tpu.ops.geometry import Size
from loans_tpu.ops.rotation_dropout import rotation_dropout
from loans_tpu.ops.stn import spatial_transform
from loans_tpu.models.resnet import (
    BasicStage,
    BottleNeckStage,
    ResNet,
    _stage_ladder,
    resnet_vbp_ladder,
)

# ImageNet channel means, RGB order, for x*255 inputs.
IMAGENET_MEAN_RGB = (123.68, 116.779, 103.939)


def _head_bias_init(key, shape, dtype=jnp.float32):
    del key
    return jnp.array([0.8, 0.0, 0.0, 0.0, 0.8, 0.0], dtype=dtype).reshape(
        shape
    )


class Localizer(nn.Module):
    """Backbone + 6-param affine head + STN crop.

    Args:
      out_size: crop size fed to the assessor.
      n_layers: backbone ResNet variant (18 = scratch reference model,
        50 = the default ``Resnet50SheepLocalizer``).
      input_size: static training input size; enables res6 (>224) and
        res7 (>300) like the reference.
      rotation_dropout_ratio: see ``ops/rotation_dropout``.
      sampler: 'separable' | 'pallas' | 'rotated' | 'rotated_pallas'
        | 'general' | 'auto' (separable when rotation_dropout_ratio == 0,
        rotated otherwise).
      transform_rois_to_grayscale: collapse crops to 1 channel.
    """

    out_size: Size = Size(75, 75)
    n_layers: int = 50
    input_size: Size = Size(224, 224)
    rotation_dropout_ratio: float = 0.0
    sampler: str = "auto"
    transform_rois_to_grayscale: bool = False
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    def _backbone(self):
        return ResNet(
            self.n_layers,
            dtype=self.dtype,
            norm_dtype=self.norm_dtype,
            name="feature_extractor",
        )

    @nn.compact
    def __call__(self, images, train: bool = True):
        """Args:
          images: (N, H, W, 3) RGB in [0, 1].

        Returns:
          (rois, theta): (N, out_h, out_w, C) crops of the *unnormalized*
          images, and the (N, 2, 3) affine params (from which grids,
          corners and boxes derive — ``ops/geometry``).
        """
        mean = jnp.asarray(IMAGENET_MEAN_RGB, dtype=images.dtype)
        x = images * 255.0 - mean
        h = self._backbone()(x.astype(self.dtype), train=train)

        if self.input_size.height > 224:
            h = self._res6()(h, train)
            if self.input_size.height > 300:
                h = self._res7()(h, train)

        self.sow("vbp_anchor", "anchor", h)
        h = jnp.mean(h, axis=(1, 2))  # global average pool

        theta = nn.Dense(
            6,
            kernel_init=nn.initializers.zeros,
            bias_init=_head_bias_init,
            dtype=jnp.float32,
            name="param_predictor",
        )(h.astype(jnp.float32))
        theta = theta.reshape(-1, 2, 3)

        rng = None
        if train and 0.0 < self.rotation_dropout_ratio < 1.0:
            rng = self.make_rng("rotation_dropout")
        theta = rotation_dropout(
            theta, self.rotation_dropout_ratio, train=train, rng=rng
        )

        method = self.sampler
        if method == "auto":
            # measured at the bench operating point (b128 ResNet-50 full
            # step): general 81.5 ms/it vs rotated-dense 130.4 — TPU
            # gathers beat the dense per-row formulation once autodiff
            # residuals are accounted for (RESULTS.md sampler table)
            method = (
                "separable" if self.rotation_dropout_ratio == 0.0 else "general"
            )
        rois = spatial_transform(images, theta, self.out_size, method=method)

        if self.transform_rois_to_grayscale:
            assert rois.shape[-1] == 3, (
                "rois are not in RGB, can not convert them to grayscale"
            )
            weights = jnp.asarray([0.299, 0.587, 0.114], dtype=rois.dtype)
            rois = jnp.sum(rois * weights, axis=-1, keepdims=True)

        return rois, theta

    def _res6(self):
        if self.n_layers in (18, 34):
            return BasicStage(2, 512, 2, self.dtype, self.norm_dtype, name="res6")
        return BottleNeckStage(
            2, 1024, 2048, 2, self.dtype, self.norm_dtype, name="res6"
        )

    def _res7(self):
        if self.n_layers in (18, 34):
            return BasicStage(2, 512, 2, self.dtype, self.norm_dtype, name="res7")
        return BottleNeckStage(
            2, 1024, 2048, 2, self.dtype, self.norm_dtype, name="res7"
        )

    def vbp_ladder(self):
        return localizer_vbp_ladder(self.n_layers, self.input_size)


def localizer_vbp_ladder(n_layers: int, input_size: Size):
    """Static VisualBackprop conv ladder for a localizer config."""
    steps = list(resnet_vbp_ladder(n_layers))
    if n_layers in (18, 34):
        extra = _stage_ladder(2, 2, bottleneck=False)
    else:
        extra = _stage_ladder(2, 2, bottleneck=True)
    if input_size.height > 224:
        steps.extend(extra)
        if input_size.height > 300:
            steps.extend(extra)
    return tuple(steps)
