"""Assessor (discriminator) network: regresses crop quality (IoU) in [0, 1].

Re-design of ``common/net.py`` (``ResnetAssessor`` + ``DownResBlock1/2/3``):
four pre-activation residual down-blocks at 128 channels, then a bias-free
linear head with sigmoid. No normalization layers anywhere (faithful to the
reference — the assessor is stateless, which keeps the alternating train
step free of a second mutable-variables collection).

NHWC, optional bfloat16 compute. Weight init: Normal(0.02)
(``common/net.py:12,34,56,72``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_w_init = nn.initializers.normal(stddev=0.02)


def _conv(features, kernel, stride, pad, dtype):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad)] * 2,
        use_bias=False,
        kernel_init=_w_init,
        dtype=dtype,
    )


class DownResBlock1(nn.Module):
    """Entry down-block: no pre-activation on the raw input
    (``common/net.py:6-25``)."""

    ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h1 = _conv(self.ch, 3, 1, 1, self.dtype)(x)
        h2 = _conv(self.ch, 4, 2, 1, self.dtype)(nn.relu(h1))
        h3 = _conv(self.ch, 4, 2, 1, self.dtype)(x)
        return h2 + h3


class DownResBlock2(nn.Module):
    """Pre-activation down-block (``common/net.py:28-47``)."""

    ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h1 = _conv(self.ch, 3, 1, 1, self.dtype)(nn.relu(x))
        h2 = _conv(self.ch, 4, 2, 1, self.dtype)(nn.relu(h1))
        h3 = _conv(self.ch, 4, 2, 1, self.dtype)(x)
        return h2 + h3


class DownResBlock3(nn.Module):
    """Pre-activation identity block (``common/net.py:50-67``)."""

    ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h1 = _conv(self.ch, 3, 1, 1, self.dtype)(nn.relu(x))
        h2 = _conv(self.ch, 3, 1, 1, self.dtype)(nn.relu(h1))
        return h2 + x


class ResnetAssessor(nn.Module):
    """Crop-quality regressor (``common/net.py:70-90``).

    Input: (N, H, W, C) crops (any spatial size; the linear head flattens).
    Output: (N, output_dim) sigmoid scores in [0, 1].
    """

    ch: int = 128
    output_dim: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = DownResBlock1(self.ch, self.dtype)(x)
        h = DownResBlock2(self.ch, self.dtype)(h)
        h = DownResBlock3(self.ch, self.dtype)(h)
        h = DownResBlock3(self.ch, self.dtype)(h)
        h = nn.relu(h)
        h = h.reshape(h.shape[0], -1)
        # pre-head features for the BBoxPlotter PCA scatter
        # (insights/bbox_plotter.py:264-281); captured only when the
        # caller marks the "features" collection mutable.
        self.sow("features", "pre_head", h)
        # 1/sqrt(fan_in) feature scaling before the wide bias-free head.
        # With Adam, one step moves every head weight by ~lr, so the
        # logit swings by lr * sum|h| — ~±46 for the unscaled 19x19x128
        # flatten, which saturates the sigmoid in one update and (under
        # amsgrad's monotone v-hat) kills the assessor permanently.
        # Scaling bounds the per-step logit swing to ~lr * sqrt(fan_in)
        # * mean|h| without changing the function class.
        h = h * (1.0 / jnp.sqrt(jnp.asarray(h.shape[-1], h.dtype)))
        h = nn.Dense(
            self.output_dim,
            use_bias=False,
            kernel_init=_w_init,
            dtype=self.dtype,
        )(h)
        return nn.sigmoid(h.astype(jnp.float32))
