"""VisualBackprop attention maps, graph-walk-free.

The reference (``insights/visual_backprop.py``) walks chainer's autograd
graph backwards from an anchor variable: at every conv/pool node it
upsamples the running relevance map with a ones-kernel
``deconvolution_2d`` (kernel geometry recovered from the node,
``:28-29``) and multiplies by the channel-averaged *input* of that node
(``scale_layer``, ``:24-39``), min-max normalizing as it goes.

JAX has no traversable autograd graph, so the contract is explicit
instead: models ``sow`` the channel-mean of each main-branch conv/pool
input into the ``vbp`` collection (``models/resnet.py``), and the
matching static conv geometry — a ladder of ``(kind, kernel, stride,
pad)`` — is a pure function of the architecture
(``resnet_vbp_ladder``, ``localizer_vbp_ladder``). This function zips
the two, running the same ones-deconv ladder as one fused XLA program
(the reference launches one cuDNN deconv per layer per frame).
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_IN_RE = re.compile(r"^in(\d+)$")


def _natural_key(name: str):
    parts = re.split(r"(\d+)", name)
    return [int(p) if p.isdigit() else p for p in parts]


def flatten_vbp(tree: Any) -> list[jax.Array]:
    """Flatten a sown ``vbp`` collection into ladder (traversal) order.

    Within each module: own ``in<i>`` entries first (ascending i), then
    child modules in natural-sorted name order — which equals creation
    order for the model family here (stages/blocks are auto-numbered in
    call order; the localizer's named children sort as
    ``feature_extractor`` < ``res6`` < ``res7``).
    """
    out: list[jax.Array] = []
    if not isinstance(tree, dict):
        return out
    own = sorted(
        (int(_IN_RE.match(k).group(1)), v)
        for k, v in tree.items()
        if isinstance(k, str) and _IN_RE.match(k)
    )
    for _, v in own:
        # sow stores a tuple of sown values per name
        out.append(v[0] if isinstance(v, (tuple, list)) else v)
    for k in sorted(
        (k for k in tree if not _IN_RE.match(str(k))), key=_natural_key
    ):
        out.extend(flatten_vbp(tree[k]))
    return out


def _minmax_normalize(x: jax.Array) -> jax.Array:
    lo = jnp.min(x, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    return (x - lo) / jnp.maximum(hi - lo, 1e-12)


def _ones_deconv(rel: jax.Array, kernel: int, stride: int, pad: int):
    """Transposed conv with a ones kernel (relevance upsampling)."""
    k = jnp.ones((kernel, kernel, 1, 1), dtype=rel.dtype)
    return jax.lax.conv_transpose(
        rel,
        k,
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _fit_to(x: jax.Array, h: int, w: int) -> jax.Array:
    """Crop/pad spatial dims to exactly (h, w) (conv floor-rounding can
    leave the deconv output off by up to stride-1; the reference passes
    ``outsize=`` to chainer's deconv instead)."""
    xh, xw = x.shape[1], x.shape[2]
    x = x[:, : min(xh, h), : min(xw, w), :]
    ph, pw = h - x.shape[1], w - x.shape[2]
    if ph > 0 or pw > 0:
        x = jnp.pad(x, ((0, 0), (0, max(ph, 0)), (0, max(pw, 0)), (0, 0)))
    return x


def visual_backprop(
    anchor: jax.Array,
    vbp_inputs: Sequence[jax.Array],
    ladder: Sequence[tuple],
) -> jax.Array:
    """Compute the attention heatmap.

    Args:
      anchor: (N, H', W', C) deepest feature map (the model's
        ``visual_backprop_anchors`` analogue).
      vbp_inputs: channel-meaned (N, h, w, 1) inputs of each ladder step,
        shallowest first (``flatten_vbp`` output).
      ladder: matching (kind, kernel, stride, pad) steps.

    Returns:
      (N, H, W, 1) heatmap in [0, 1] at input resolution.
    """
    if len(vbp_inputs) != len(ladder):
        raise ValueError(
            f"{len(vbp_inputs)} sown inputs vs {len(ladder)} ladder steps"
        )
    rel = _minmax_normalize(
        jnp.mean(anchor.astype(jnp.float32), axis=-1, keepdims=True)
    )
    for (kind, kernel, stride, pad), inp in zip(
        reversed(ladder), reversed(list(vbp_inputs))
    ):
        del kind  # conv and pool upsample identically (ones kernel)
        inp = inp.astype(jnp.float32)
        rel = _ones_deconv(rel, kernel, stride, pad)
        rel = _fit_to(rel, inp.shape[1], inp.shape[2])
        rel = _minmax_normalize(rel * inp)
    return rel


def localizer_visual_backprop(localizer, variables, images) -> np.ndarray:
    """Convenience host API: eval-mode forward + heatmap for a batch."""
    _, state = localizer.apply(
        variables,
        images,
        train=False,
        mutable=["vbp", "vbp_anchor"],
    )
    anchor = state["vbp_anchor"]["anchor"][0]
    inputs = flatten_vbp(state["vbp"])
    ladder = localizer.vbp_ladder()
    heat = visual_backprop(anchor, inputs, ladder)
    return np.asarray(jax.device_get(heat))
