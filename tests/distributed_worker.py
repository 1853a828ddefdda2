"""Worker process for the 2-process jax.distributed test.

Each process owns 2 virtual CPU devices; the pair forms a 4-device
global mesh. The worker initializes the distributed runtime, assembles
its process-local slice of the global batch
(``parallel/distributed.py::assemble_global_batch`` — the TPU-native
equivalent of the reference's per-GPU dataset splits,
``schaaaafrichter/train.py:159-166,189-191``), runs ONE alternating
train step, and prints the updated (replicated) head bias so the parent
can assert cross-process agreement.

Usage: python tests/distributed_worker.py <coordinator> <n_procs> <pid>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, n_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from loans_tpu.parallel.distributed import (
        assemble_global_batch,
        initialize_distributed,
        local_batch_slice,
    )

    initialize_distributed(
        coordinator_address=coordinator, num_processes=n_procs, process_id=pid
    )
    assert jax.process_count() == n_procs, jax.process_count()
    assert len(jax.devices()) == 2 * n_procs

    # Create the Gloo communicator NOW, while the two processes are
    # still seconds apart (just released from the coordinator's init
    # barrier). XLA:CPU builds it lazily at the FIRST collective, whose
    # socket connect has a fixed ~30s timeout — if that first collective
    # is the train step, a compile-time disparity between the workers on
    # a loaded 1-core box blows the window ("Gloo context initialization
    # failed: Connect timeout", the round-2/3 suite flake).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("gloo-context-warmup")

    import jax.numpy as jnp
    import numpy as np

    from loans_tpu.models import Localizer, ResnetAssessor
    from loans_tpu.ops import Size
    from loans_tpu.parallel import create_mesh, replicate
    from loans_tpu.train import (
        AlternatingConfig,
        adam_amsgrad,
        create_train_state,
        make_train_step,
    )

    img, crop = Size(32, 32), Size(8, 8)
    localizer = Localizer(out_size=crop, n_layers=18, input_size=img)
    assessor = ResnetAssessor(ch=8)
    rng = jax.random.key(0)
    loc_state = create_train_state(
        localizer, rng, jnp.zeros((2, img.height, img.width, 3)),
        adam_amsgrad(1e-3), train=False,
    )
    ass_state = create_train_state(
        assessor, rng, jnp.zeros((2, crop.height, crop.width, 3)),
        adam_amsgrad(1e-3),
    )
    mesh = create_mesh()  # spans both processes' devices
    loc_state = replicate(mesh, loc_state)
    ass_state = replicate(mesh, ass_state)

    global_batch = 8
    start, per = local_batch_slice(global_batch)
    assert per == global_batch // n_procs and start == pid * per
    gen = np.random.default_rng(0)
    # every process generates the full deterministic batch, feeds its slice
    full = {
        "real": gen.uniform(size=(global_batch, crop.height, crop.width, 3)),
        "labels": gen.uniform(size=(global_batch, 1)),
        "unlabeled": gen.uniform(
            size=(global_batch, img.height, img.width, 3)
        ),
    }
    local = {
        k: v[start : start + per].astype(np.float32) for k, v in full.items()
    }
    batch = assemble_global_batch(mesh, local)
    assert jax.tree_util.tree_leaves(batch)[0].shape[0] == global_batch

    step = make_train_step(
        localizer, assessor, AlternatingConfig(image_size=img)
    )
    loc_state, ass_state, metrics = step(
        loc_state, ass_state, batch, jax.random.key(1)
    )
    bias = np.asarray(
        jax.device_get(loc_state.params["param_predictor"]["bias"])
    )
    loss = float(jax.device_get(metrics["loss_localizer"]))
    print("RESULT", pid, loss, " ".join(f"{b:.8f}" for b in bias), flush=True)


if __name__ == "__main__":
    main()
