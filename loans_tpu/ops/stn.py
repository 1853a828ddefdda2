"""Spatial transformer: affine grid generation + differentiable bilinear crop.

This is the load-bearing custom op of the framework — the reference delegates
it to chainer's CUDA kernels (``F.spatial_transformer_grid`` /
``F.spatial_transformer_sampler``, ``sheep/sheep_localizer.py:62-63``); the
gradient that flows crop -> affine params -> backbone is where localizer
learning happens.

Five TPU-native implementations, equal numerics:

1. ``sample_grid`` — general gather-based bilinear sampling of a
   materialized grid. Works for arbitrary affine transforms (rotation,
   shear). Gathers are VPU/scalar work on TPU; this is the correctness
   reference for the other paths.

1b. ``sample_rotated_dense`` / ``sample_rotated_pallas`` — the fast
   general-affine paths: for an affine grid both coordinates vary
   linearly along an output row, so direct bilinear sampling factors
   into per-row dense hat-weight contractions that run on the MXU (no
   gathers, no scatter-add backward). Used when
   ``rotation_dropout_ratio > 0`` makes theta non-axis-aligned.

2. ``sample_separable`` — the production path. The production config runs
   ``rotation_dropout(ratio=0.0)`` (``sheep/sheep_localizer.py:61``) which
   statically zeroes the affine off-diagonals (see ``rotation_dropout.py``),
   so sampling is axis-aligned and *separable*: a bilinear row-interpolation
   matrix and a column-interpolation matrix applied as two batched matmuls.
   XLA maps these straight onto the MXU — no gathers, no scatter-add in the
   backward (the VJP is two more matmuls). Differentiable in images and
   theta via autodiff.

3. ``sample_separable_pallas`` — fused Pallas kernel of (2): builds the
   interpolation weights in VMEM from iota (never materializing them in
   HBM) and runs both contractions on the MXU, one image per grid step.
   Backward delegates to the VJP of (2) via ``jax.custom_vjp``.

Coordinate convention (matches chainer / cuDNN SpatialTf):
  * grid channels are (x, y) in [-1, 1]; (-1, -1) is the top-left corner.
  * pixel mapping is align-corners: px = (x + 1) / 2 * (W - 1).
  * out-of-bounds samples read zeros (zero padding), with bilinear
    weights tapering to zero over the one-pixel border.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from loans_tpu.ops.geometry import Size


def affine_grid(theta: jax.Array, out_size: Size) -> jax.Array:
    """Materialize the sampling grid (parity with
    ``F.spatial_transformer_grid``, but laid out (N, H, W, 2) instead of
    (N, 2, H, W)).

    Args:
      theta: (N, 2, 3) affine params; row 0 produces x, row 1 produces y.
      out_size: crop size (H_out, W_out).

    Returns:
      (N, H_out, W_out, 2) grid with channels (x, y) in [-1, 1].
    """
    h, w = int(out_size.height), int(out_size.width)
    ys = jnp.linspace(-1.0, 1.0, h, dtype=theta.dtype)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=theta.dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(grid_x)
    base = jnp.stack([grid_x, grid_y, ones], axis=-1)  # (H, W, 3)
    return jnp.einsum(
        "nij,hwj->nhwi", theta, base, precision=jax.lax.Precision.HIGHEST
    )


def sample_grid(images: jax.Array, grid: jax.Array) -> jax.Array:
    """General bilinear sampling of NHWC images at grid points.

    Parity with ``F.spatial_transformer_sampler`` (zero padding outside the
    image). Differentiable in both arguments via autodiff.

    Args:
      images: (N, H, W, C).
      grid: (N, H_out, W_out, 2) with channels (x, y) in [-1, 1].

    Returns:
      (N, H_out, W_out, C) crops.
    """
    n, h, w, c = images.shape
    px = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    py = (grid[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def gather(yi, xi):
        valid = (
            (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        )
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = images.reshape(n, h * w, c)
        idx = yc * w + xc  # (N, H_out, W_out)
        vals = jnp.take_along_axis(
            flat[:, :, None, :],
            idx.reshape(n, -1)[:, :, None, None],
            axis=1,
        ).reshape(grid.shape[:3] + (c,))
        return vals * valid[..., None].astype(images.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    wx = wx[..., None].astype(images.dtype)
    wy = wy[..., None].astype(images.dtype)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def _interp_weights(
    scale: jax.Array, shift: jax.Array, out_dim: int, in_dim: int, dtype
) -> jax.Array:
    """Bilinear interpolation matrix for one separable axis.

    Output position i (normalized u_i = -1 + 2i/(out-1)) samples input
    pixel p_i = (scale * u_i + shift + 1) / 2 * (in - 1); weight on input
    index j is the bilinear hat max(0, 1 - |p_i - j|), which reproduces
    zero padding outside the image.

    Args:
      scale, shift: (N,) per-sample affine scale/translation for this axis.
      out_dim, in_dim: static sizes.

    Returns:
      (N, out_dim, in_dim) weight matrices.

    Coordinate math runs in float32 regardless of ``dtype``: pixel
    positions reach in_dim-1 (e.g. 223) where bfloat16 spacing is ~1px,
    which would quantize the sampling positions themselves. Only the
    final hat weights are cast down for the MXU contraction.
    """
    u = jnp.linspace(-1.0, 1.0, out_dim, dtype=jnp.float32)
    p = (
        scale.astype(jnp.float32)[:, None] * u[None, :]
        + shift.astype(jnp.float32)[:, None]
        + 1.0
    ) * (0.5 * (in_dim - 1))  # (N, out_dim)
    j = jnp.arange(in_dim, dtype=jnp.float32)
    return jnp.maximum(
        0.0, 1.0 - jnp.abs(p[:, :, None] - j[None, None, :])
    ).astype(dtype)


def sample_separable(
    images: jax.Array, theta: jax.Array, out_size: Size
) -> jax.Array:
    """Axis-aligned affine crop as two batched MXU matmuls.

    Requires theta off-diagonals to be zero (guaranteed on the production
    path by ``rotation_dropout(ratio=0.0)``); ignores them if nonzero.

    Args:
      images: (N, H, W, C).
      theta: (N, 2, 3); uses theta[:, 0, 0] (x scale), theta[:, 0, 2]
        (x shift), theta[:, 1, 1] (y scale), theta[:, 1, 2] (y shift).
      out_size: crop size.

    Returns:
      (N, H_out, W_out, C) crops.
    """
    n, h, w, c = images.shape
    h_out, w_out = int(out_size.height), int(out_size.width)
    cdt = images.dtype
    ky = _interp_weights(
        theta[:, 1, 1], theta[:, 1, 2], h_out, h, cdt
    )  # (N, h_out, H)
    kx = _interp_weights(
        theta[:, 0, 0], theta[:, 0, 2], w_out, w, cdt
    )  # (N, w_out, W)
    # Contract input rows, then input columns: both are batched matmuls.
    tmp = jax.lax.dot_general(
        ky,
        images.reshape(n, h, w * c),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (N, h_out, W*C)
    tmp = tmp.reshape(n, h_out, w, c)
    out = jnp.einsum(
        "nwq,nhqc->nhwc",
        kx,
        tmp,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(images.dtype)


def _rotated_dense_fwd_impl(
    images: jax.Array, theta: jax.Array, h_out: int, w_out: int
) -> jax.Array:
    """Forward scan of the dense rotated sampler (see
    ``sample_rotated_dense``)."""
    n, h, w, c = images.shape
    cdt = images.dtype
    t = theta.astype(jnp.float32)
    u = jnp.linspace(-1.0, 1.0, w_out, dtype=jnp.float32)  # (w_out,)
    v = jnp.linspace(-1.0, 1.0, h_out, dtype=jnp.float32)  # (h_out,)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)

    def row(_, vi):
        # Sampling pixel coords along this output row: (N, w_out).
        px = (
            t[:, 0, 0, None] * u + t[:, 0, 1, None] * vi + t[:, 0, 2, None]
            + 1.0
        ) * (0.5 * (w - 1))
        py = (
            t[:, 1, 0, None] * u + t[:, 1, 1, None] * vi + t[:, 1, 2, None]
            + 1.0
        ) * (0.5 * (h - 1))
        wxm = jnp.maximum(
            0.0, 1.0 - jnp.abs(px[:, None, :] - xs[None, :, None])
        ).astype(cdt)  # (N, W, w_out)
        wym = jnp.maximum(
            0.0, 1.0 - jnp.abs(py[:, None, :] - ys[None, :, None])
        ).astype(cdt)  # (N, H, w_out)
        tmp = jax.lax.dot_general(
            images,
            wxm,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, H, C, w_out)
        out_row = jnp.einsum(
            "nhj,nhcj->njc",
            wym,
            tmp.astype(cdt),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, w_out, C)
        return None, out_row.astype(cdt)

    _, rows = jax.lax.scan(row, None, v)  # (h_out, N, w_out, C)
    return rows.transpose(1, 0, 2, 3)


def _rotated_dense_bwd_impl(images, theta, h_out, w_out, g):
    """Analytic VJP of the dense rotated sampler — recompute, not store.

    Autodiff of the forward scan stores the per-row hat-weight matrices
    and the (N, H, C, w_out) intermediate as scan residuals (~1 GB/call
    at the production shape — RESULTS.md round 2); this backward instead
    *recomputes* the hats per row from (theta, g) and contracts:

      d img[y, x]   = sum_i,j hatY_i[y, j] hatX_i[x, j] g[i, j]
      d px[i, j]    = sum_c g[i, j, c] * (hatX' instead of hatX sample)
      d py[i, j]    = sum_c g[i, j, c] * (hatY' instead of hatY sample)
      d theta row 0 = (w-1)/2 * [sum gpx*u, sum gpx*v_i, sum gpx]
      d theta row 1 = (h-1)/2 * [sum gpy*u, sum gpy*v_i, sum gpy]

    with hat'(d) = -sign(d) on |d| < 1 (the bilinear subgradient autodiff
    uses). Every contraction is a batched MXU matmul of the same shape as
    the forward's; residual memory drops to (images, theta, g).
    """
    n, h, w, c = images.shape
    cdt = images.dtype
    t = theta.astype(jnp.float32)
    u = jnp.linspace(-1.0, 1.0, w_out, dtype=jnp.float32)
    v = jnp.linspace(-1.0, 1.0, h_out, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    g = g.astype(cdt)  # (N, h_out, w_out, C)

    def hat_pair(p, idx):
        """hat and hat' weight matrices: (N, in_dim, w_out)."""
        d = p[:, None, :] - idx[None, :, None]
        live = jnp.abs(d) < 1.0
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(d))
        dhat = jnp.where(live, -jnp.sign(d), 0.0)
        return hat.astype(cdt), dhat.astype(cdt)

    def row(dimg, row_in):
        vi, gi = row_in  # gi: (N, w_out, C)
        px = (
            t[:, 0, 0, None] * u + t[:, 0, 1, None] * vi + t[:, 0, 2, None]
            + 1.0
        ) * (0.5 * (w - 1))
        py = (
            t[:, 1, 0, None] * u + t[:, 1, 1, None] * vi + t[:, 1, 2, None]
            + 1.0
        ) * (0.5 * (h - 1))
        wxm, dwxm = hat_pair(px, xs)  # (N, W, w_out)
        wym, dwym = hat_pair(py, ys)  # (N, H, w_out)

        # recomputed forward intermediates (hatX and hatX' variants)
        tmp = jax.lax.dot_general(
            images, wxm,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, H, C, w_out)
        tmpd = jax.lax.dot_general(
            images, dwxm,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, H, C, w_out)
        # gpx[n,j] = sum_c gi * sample(hatX', hatY); gpy with (hatX, hatY')
        sx = jnp.einsum(
            "nhj,nhcj->njc", wym, tmpd.astype(cdt),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sy = jnp.einsum(
            "nhj,nhcj->njc", dwym, tmp.astype(cdt),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        gif = gi.astype(jnp.float32)
        gpx = jnp.sum(gif * sx, axis=-1) * (0.5 * (w - 1))  # (N, w_out)
        gpy = jnp.sum(gif * sy, axis=-1) * (0.5 * (h - 1))

        # d images: A[n,h,j,c] = hatY * g ; dimg += A contract_j hatX
        a = wym[:, :, :, None] * gi[:, None, :, :]  # (N, H, w_out, C)
        dimg_row = jax.lax.dot_general(
            a, wxm,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, H, C, W)
        dimg = dimg + dimg_row.transpose(0, 1, 3, 2)

        # d theta contributions from this row
        dt = jnp.stack(
            [
                gpx @ u, jnp.sum(gpx, -1) * vi, jnp.sum(gpx, -1),
                gpy @ u, jnp.sum(gpy, -1) * vi, jnp.sum(gpy, -1),
            ],
            axis=-1,
        )  # (N, 6)
        return dimg, dt

    dimg0 = jnp.zeros((n, h, w, c), dtype=jnp.float32)
    # g laid out rows-first for the scan: (h_out, N, w_out, C)
    dimg, dts = jax.lax.scan(row, dimg0, (v, g.transpose(1, 0, 2, 3)))
    dtheta = jnp.sum(dts, axis=0).reshape(n, 2, 3).astype(theta.dtype)
    return dimg.astype(images.dtype), dtheta


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sample_rotated_dense(images, theta, h_out, w_out):
    return _rotated_dense_fwd_impl(images, theta, h_out, w_out)


def _rotated_dense_fwd(images, theta, h_out, w_out):
    return (
        _rotated_dense_fwd_impl(images, theta, h_out, w_out),
        (images, theta),
    )


def _rotated_dense_bwd(h_out, w_out, residuals, g):
    images, theta = residuals
    return _rotated_dense_bwd_impl(images, theta, h_out, w_out, g)


_sample_rotated_dense.defvjp(_rotated_dense_fwd, _rotated_dense_bwd)


def sample_rotated_dense(
    images: jax.Array, theta: jax.Array, out_size: Size
) -> jax.Array:
    """General-affine bilinear crop as dense per-row MXU contractions.

    Replaces the gather path (``sample_grid``) for rotated/sheared theta
    with TPU-friendly dense math, *bit-exact in semantics*: for an
    affine grid, both sampling coordinates vary linearly along an output
    row, so direct bilinear sampling factors per row i as

        out[i, j] = sum_y hat(py(i,j) - y) * (img[y, :] @ hat(px(i,j) - x))

    i.e. one (H,W)x(W,w_out) matmul against a hat-weight matrix built
    from iota, then a masked reduction over H. No gathers, no
    scatter-adds in the backward. Exactly matches
    ``sample_grid(images, affine_grid(theta))`` including zero padding
    (hat weights taper to zero over the one-pixel border).

    The backward is a hand-written analytic VJP
    (``_rotated_dense_bwd_impl``) that recomputes the hat weights per
    row instead of storing them as scan residuals — autodiff of the
    forward scan kept ~1 GB of per-row residuals at the production
    shape, which made this path lose to the gather sampler end-to-end
    (RESULTS.md round 2).

    Reference op being replaced: ``F.spatial_transformer_sampler``
    (``sheep/sheep_localizer.py:63``) on the ``rotation_dropout_ratio
    > 0`` path where theta has nonzero off-diagonals.

    Args:
      images: (N, H, W, C).
      theta: (N, 2, 3) arbitrary affine params.
      out_size: crop size.

    Returns:
      (N, H_out, W_out, C) crops.
    """
    return _sample_rotated_dense(
        images, theta, int(out_size.height), int(out_size.width)
    )


def _separable_kernel(theta_ref, img_ref, out_ref):
    """Pallas kernel: one image per grid step, fused weights + 2 matmuls.

    Blocks are NCHW so the channel loop slices *major* dims (free in
    Mosaic); all compute is 2D VPU iota math + 2D MXU matmuls — no
    reshapes or relayouts inside the kernel.
    """
    c = img_ref.shape[1]
    h = img_ref.shape[2]
    w = img_ref.shape[3]
    h_out = out_ref.shape[2]
    w_out = out_ref.shape[3]

    b = pl.program_id(0)
    sy = theta_ref[b, 4]
    ty = theta_ref[b, 5]
    sx = theta_ref[b, 0]
    tx = theta_ref[b, 2]

    def weights(scale, shift, out_dim, in_dim, transpose):
        shape = (in_dim, out_dim) if transpose else (out_dim, in_dim)
        out_axis = 1 if transpose else 0
        i = jax.lax.broadcasted_iota(jnp.int32, shape, out_axis).astype(
            jnp.float32
        )
        j = jax.lax.broadcasted_iota(
            jnp.int32, shape, 1 - out_axis
        ).astype(jnp.float32)
        step = 2.0 / (out_dim - 1) if out_dim > 1 else 0.0
        u = -1.0 + step * i
        p = (scale * u + shift + 1.0) * (0.5 * (in_dim - 1))
        return jnp.maximum(0.0, 1.0 - jnp.abs(p - j))

    ky = weights(sy, ty, h_out, h, transpose=False)  # (h_out, H)
    kxt = weights(sx, tx, w_out, w, transpose=True)  # (W, w_out)

    for ch in range(c):
        img = img_ref[0, ch].astype(jnp.float32)  # (H, W)
        tmp = jnp.dot(
            ky,
            img,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out = jnp.dot(
            tmp,
            kxt,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[0, ch] = out.astype(out_ref.dtype)


def _rotated_kernel(theta_ref, img_ref, out_ref):
    """Pallas kernel: one image per grid step, rows looped in-kernel.

    The image block stays resident in VMEM across the whole row loop and
    neither the per-row hat-weight matrices nor the (H, w_out)
    intermediate ever touch HBM — the XLA ``sample_rotated_dense``
    formulation streams ~1 GB/call of weight+intermediate traffic that
    this kernel eliminates entirely.
    """
    c = img_ref.shape[1]
    h = img_ref.shape[2]
    w = img_ref.shape[3]
    h_out = out_ref.shape[2]
    w_out = out_ref.shape[3]

    b = pl.program_id(0)
    t00 = theta_ref[b, 0]
    t01 = theta_ref[b, 1]
    t02 = theta_ref[b, 2]
    t10 = theta_ref[b, 3]
    t11 = theta_ref[b, 4]
    t12 = theta_ref[b, 5]

    imgs = [img_ref[0, ch].astype(jnp.float32) for ch in range(c)]

    step_v = 2.0 / (h_out - 1) if h_out > 1 else 0.0
    step_u = 2.0 / (w_out - 1) if w_out > 1 else 0.0

    def hat(scale, offset, in_dim):
        # (in_dim, w_out): rows = input pixel index, cols = output pos j.
        # Sampling coordinate along the row: p_j = scale*u_j + offset,
        # mapped to pixels align-corners.
        jj = jax.lax.broadcasted_iota(jnp.int32, (in_dim, w_out), 1).astype(
            jnp.float32
        )
        pix = jax.lax.broadcasted_iota(jnp.int32, (in_dim, w_out), 0).astype(
            jnp.float32
        )
        p = (scale * (-1.0 + step_u * jj) + offset + 1.0) * (
            0.5 * (in_dim - 1)
        )
        return jnp.maximum(0.0, 1.0 - jnp.abs(p - pix))

    def body(i, carry):
        vi = -1.0 + step_v * i.astype(jnp.float32)
        wxm = hat(t00, t01 * vi + t02, w)  # (W, w_out)
        wym = hat(t10, t11 * vi + t12, h)  # (H, w_out)
        for ch in range(c):
            tmp = jnp.dot(
                imgs[ch],
                wxm,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (H, w_out)
            row = jnp.sum(wym * tmp, axis=0, keepdims=True)  # (1, w_out)
            # dynamic sublane store of one output row (Mosaic supports
            # dynamic ref slices; loop-carried dynamic_update_slice
            # does not lower)
            out_ref[0, ch, pl.ds(i, 1), :] = row.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, h_out, body, 0)


def _sample_rotated_pallas_fwd_impl(
    images: jax.Array, theta: jax.Array, h_out: int, w_out: int
) -> jax.Array:
    n, h, w, c = images.shape
    theta_flat = theta.reshape(n, 6).astype(jnp.float32)
    interpret = jax.default_backend() != "tpu"
    images_nchw = images.transpose(0, 3, 1, 2)
    out_nchw = pl.pallas_call(
        _rotated_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, c, h, w),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, h_out, w_out),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, h_out, w_out), images.dtype),
        interpret=interpret,
    )(theta_flat, images_nchw)
    return out_nchw.transpose(0, 2, 3, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sample_rotated_pallas(images, theta, h_out, w_out):
    return _sample_rotated_pallas_fwd_impl(images, theta, h_out, w_out)


def _rotated_pallas_fwd(images, theta, h_out, w_out):
    out = _sample_rotated_pallas_fwd_impl(images, theta, h_out, w_out)
    return out, (images, theta)


def _rotated_pallas_bwd(h_out, w_out, residuals, g):
    images, theta = residuals
    _, vjp = jax.vjp(
        lambda im, th: sample_rotated_dense(im, th, Size(h_out, w_out)),
        images,
        theta,
    )
    return vjp(g)


_sample_rotated_pallas.defvjp(_rotated_pallas_fwd, _rotated_pallas_bwd)


def sample_rotated_pallas(
    images: jax.Array, theta: jax.Array, out_size: Size
) -> jax.Array:
    """Fused Pallas version of ``sample_rotated_dense`` (forward), with
    the dense formulation's VJP as its backward."""
    return _sample_rotated_pallas(
        images, theta, int(out_size.height), int(out_size.width)
    )


def _sample_separable_pallas_fwd_impl(
    images: jax.Array, theta: jax.Array, h_out: int, w_out: int
) -> jax.Array:
    n, h, w, c = images.shape
    theta_flat = theta.reshape(n, 6).astype(jnp.float32)
    # Interpret on non-TPU backends so the same code path runs in CPU
    # tests (8-device virtual mesh) and on real chips.
    interpret = jax.default_backend() != "tpu"
    images_nchw = images.transpose(0, 3, 1, 2)
    out_nchw = pl.pallas_call(
        _separable_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, c, h, w),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, h_out, w_out),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, h_out, w_out), images.dtype),
        interpret=interpret,
    )(theta_flat, images_nchw)
    return out_nchw.transpose(0, 2, 3, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sample_separable_pallas(images, theta, h_out, w_out):
    return _sample_separable_pallas_fwd_impl(images, theta, h_out, w_out)


def _pallas_fwd(images, theta, h_out, w_out):
    out = _sample_separable_pallas_fwd_impl(images, theta, h_out, w_out)
    return out, (images, theta)


def _pallas_bwd(h_out, w_out, residuals, g):
    images, theta = residuals
    # Backward through the mathematically identical separable formulation;
    # its VJP is itself two batched matmuls per input (MXU work).
    _, vjp = jax.vjp(
        lambda im, th: sample_separable(im, th, Size(h_out, w_out)),
        images,
        theta,
    )
    return vjp(g)


_sample_separable_pallas.defvjp(_pallas_fwd, _pallas_bwd)


def sample_separable_pallas(
    images: jax.Array, theta: jax.Array, out_size: Size
) -> jax.Array:
    """Fused Pallas version of ``sample_separable`` (forward), with the
    separable VJP as its backward."""
    return _sample_separable_pallas(
        images, theta, int(out_size.height), int(out_size.width)
    )


def spatial_transform(
    images: jax.Array,
    theta: jax.Array,
    out_size: Size,
    method: str = "separable",
) -> jax.Array:
    """Crop ``images`` with affine params ``theta``.

    Args:
      images: (N, H, W, C).
      theta: (N, 2, 3).
      out_size: crop size.
      method: 'separable' (MXU matmuls; requires axis-aligned theta),
        'pallas' (fused kernel, same requirement), 'rotated' (dense
        per-row MXU contractions; any theta), 'rotated_pallas' (fused
        kernel of the same; any theta), or 'general' (gather-based
        correctness reference; any theta).

    Returns:
      (N, H_out, W_out, C) crops.
    """
    if method == "separable":
        return sample_separable(images, theta, out_size)
    if method == "pallas":
        return sample_separable_pallas(images, theta, out_size)
    if method == "rotated":
        return sample_rotated_dense(images, theta, out_size)
    if method == "rotated_pallas":
        return sample_rotated_pallas(images, theta, out_size)
    if method == "general":
        return sample_grid(images, affine_grid(theta, out_size))
    raise ValueError(f"unknown spatial_transform method: {method!r}")
