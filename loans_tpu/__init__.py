"""loans_tpu — TPU-native Localizer-Assessor Networks framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the LoANs
reference ("Weakly Supervised Object Detection with Localizer Assessor
Networks", Bartzi/loans). The reference is a Chainer/cupy CUDA codebase;
this framework is TPU-first:

* pure-functional pytree model/optimizer state (flax.linen + optax),
* one jitted alternating train step (no define-by-run graph surgery),
* NHWC layouts, bfloat16 matmul paths, static shapes,
* the spatial-transformer crop as a fused MXU-friendly op (separable
  matmul formulation + Pallas kernel) instead of a CUDA gather kernel,
* data parallelism via jax.sharding.Mesh + NamedSharding (XLA collectives
  over ICI), not process-forking updaters,
* orbax-style checkpoints + a JSON config manifest instead of the
  reference's "copy the model source file into the log dir" contract.
"""

__version__ = "0.1.0"

import os as _os

# Honor an explicit platform request even where site customization
# pre-registers an accelerator backend and overrides JAX_PLATFORMS
# (e.g. LOANS_PLATFORM=cpu for host-side smoke runs and CI).
_platform = _os.environ.get("LOANS_PLATFORM")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)
