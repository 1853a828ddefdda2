"""Component-wise timing of the alternating step on the real chip."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from loans_tpu.models import Localizer, ResnetAssessor
from loans_tpu.ops import Size
from loans_tpu.train import adam_amsgrad, create_train_state

BATCH = 64
IMG, CROP = Size(224, 224), Size(75, 75)


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:7.2f} ms", flush=True)
    return dt


def main():
    localizer = Localizer(out_size=CROP, n_layers=50, dtype=jnp.bfloat16)
    assessor = ResnetAssessor(dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    loc = create_train_state(
        localizer, rng, jnp.zeros((2, 224, 224, 3)), adam_amsgrad(1e-3),
        train=False,
    )
    ass = create_train_state(
        assessor, rng, jnp.zeros((2, 75, 75, 3)), adam_amsgrad(1e-3)
    )
    g = np.random.default_rng(0)
    imgs = jnp.asarray(g.uniform(size=(BATCH, 224, 224, 3)).astype("f"))
    crops = jnp.asarray(g.uniform(size=(BATCH, 75, 75, 3)).astype("f"))
    labels = jnp.asarray(g.uniform(size=(BATCH, 1)).astype("f"))

    @jax.jit
    def loc_fwd(params, stats, x):
        (rois, theta), _ = localizer.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
        )
        return rois, theta

    @jax.jit
    def ass_fwd(params, x):
        return assessor.apply({"params": params}, x)

    @jax.jit
    def loc_fwd_bwd(params, stats, x):
        def loss(p):
            (rois, theta), upd = localizer.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean(rois.astype(jnp.float32) ** 2), upd
        (l, _), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return grads

    @jax.jit
    def ass_fwd_bwd(params, x, y):
        def loss(p):
            return jnp.mean((assessor.apply({"params": p}, x) - y) ** 2)
        return jax.grad(loss)(params)

    @jax.jit
    def full_loc_loss_bwd(loc_params, stats, ass_params, x):
        def loss(p):
            (rois, theta), upd = localizer.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            y = assessor.apply({"params": ass_params}, rois)
            return jnp.mean((y - 1.0) ** 2), upd
        (_, _), grads = jax.value_and_grad(loss, has_aux=True)(loc_params)
        return grads

    timeit("localizer fwd (224^2, bs64)", loc_fwd, loc.params,
           loc.batch_stats, imgs)
    timeit("assessor fwd (75^2, bs64)", ass_fwd, ass.params, crops)
    timeit("localizer fwd+bwd", loc_fwd_bwd, loc.params, loc.batch_stats,
           imgs)
    timeit("assessor fwd+bwd", ass_fwd_bwd, ass.params, crops, labels)
    timeit("loc loss fwd+bwd thru assessor", full_loc_loss_bwd,
           loc.params, loc.batch_stats, ass.params, imgs)


if __name__ == "__main__":
    main()
