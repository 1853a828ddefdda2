"""Rotation dropout on affine transform parameters.

Reference: ``functions/rotation_droput.py`` [sic] — a custom chainer
Function that multiplies the off-diagonal (rotation/shear) entries of the
(N, 2, 3) affine matrix by a mask and backpropagates through the same mask.

Exact reference semantics (``functions/rotation_droput.py:26-48``):
  * train: one Bernoulli draw per call, shared across the batch; the
    off-diagonals are multiplied by ``1`` with probability ``ratio`` and by
    ``0`` otherwise (``flag = rand() < ratio``).
  * eval: the off-diagonals are deterministically scaled by ``ratio``.
  * backward: grad * mask (which is what autodiff of a multiply gives, so
    no custom VJP is needed in JAX).

The production config calls this with ``ratio=0.0``
(``sheep/sheep_localizer.py:61``), which therefore *always* zeroes the
rotation/shear terms in both modes — the transform is constrained to
axis-aligned scale+translate. ``rotation_dropout`` exploits that statically
(enabling the separable MXU sampling path) while remaining faithful for
nonzero ratios.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_OFFDIAG_ZERO = jnp.array(
    [[1.0, 0.0, 1.0], [0.0, 1.0, 1.0]], dtype=jnp.float32
)


def rotation_dropout(
    theta: jax.Array,
    ratio: float = 0.5,
    *,
    train: bool = True,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Apply rotation dropout to (N, 2, 3) affine params.

    Args:
      theta: (N, 2, 3) affine parameters.
      ratio: keep-probability of the off-diagonal terms in train mode /
        their deterministic scale in eval mode (reference semantics).
      train: training-mode flag (static).
      rng: PRNG key; required when ``train`` and ``0 < ratio < 1``.

    Returns:
      (N, 2, 3) masked parameters.
    """
    offdiag_keep = _OFFDIAG_ZERO.astype(theta.dtype)
    if ratio == 0.0:
        # Static fast path: off-diagonals are zero in train (flag always
        # False) and eval (scale 0) alike. Masking with a constant lets
        # XLA/our sampler treat the transform as axis-aligned.
        return theta * offdiag_keep
    if not train:
        scale = offdiag_keep + (1.0 - offdiag_keep) * ratio
        return theta * scale
    if ratio >= 1.0:
        return theta
    if rng is None:
        raise ValueError(
            "rotation_dropout(train=True, 0<ratio<1) needs an rng key"
        )
    flag = (
        jax.random.uniform(rng, (), dtype=theta.dtype) < ratio
    ).astype(theta.dtype)
    mask = offdiag_keep + (1.0 - offdiag_keep) * flag
    return theta * mask
