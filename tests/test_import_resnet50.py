"""Weight-import tool: synthetic torch/chainer checkpoints must map onto
every backbone tensor of the flax ResNet-50."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from import_resnet50 import BLOCKS, convert_chainer, convert_torch  # noqa: E402

MIDS = (64, 128, 256, 512)
OUTS = (256, 512, 1024, 2048)


def fake_torch_state(rng):
    state = {}

    def bn(prefix, ch):
        state[prefix + ".weight"] = rng.normal(size=(ch,)).astype("f")
        state[prefix + ".bias"] = rng.normal(size=(ch,)).astype("f")
        state[prefix + ".running_mean"] = rng.normal(size=(ch,)).astype("f")
        state[prefix + ".running_var"] = rng.uniform(
            0.5, 1.5, size=(ch,)
        ).astype("f")

    state["conv1.weight"] = rng.normal(size=(64, 3, 7, 7)).astype("f")
    bn("bn1", 64)
    in_ch = 64
    for s, n_blocks in enumerate(BLOCKS):
        mid, out = MIDS[s], OUTS[s]
        for b in range(n_blocks):
            t = f"layer{s + 1}.{b}"
            cin = in_ch if b == 0 else out
            state[f"{t}.conv1.weight"] = rng.normal(
                size=(mid, cin, 1, 1)
            ).astype("f")
            bn(f"{t}.bn1", mid)
            state[f"{t}.conv2.weight"] = rng.normal(
                size=(mid, mid, 3, 3)
            ).astype("f")
            bn(f"{t}.bn2", mid)
            state[f"{t}.conv3.weight"] = rng.normal(
                size=(out, mid, 1, 1)
            ).astype("f")
            bn(f"{t}.bn3", out)
            if b == 0:
                state[f"{t}.downsample.0.weight"] = rng.normal(
                    size=(out, cin, 1, 1)
                ).astype("f")
                bn(f"{t}.downsample.1", out)
        in_ch = out
    return state


def fake_chainer_npz(rng):
    npz = {}

    def bn(prefix, ch):
        npz[prefix + "/gamma"] = rng.normal(size=(ch,)).astype("f")
        npz[prefix + "/beta"] = rng.normal(size=(ch,)).astype("f")
        npz[prefix + "/avg_mean"] = rng.normal(size=(ch,)).astype("f")
        npz[prefix + "/avg_var"] = rng.uniform(0.5, 1.5, size=(ch,)).astype(
            "f"
        )

    npz["conv1/W"] = rng.normal(size=(64, 3, 7, 7)).astype("f")
    bn("bn1", 64)
    in_ch = 64
    for s, n_blocks in enumerate(BLOCKS):
        mid, out = MIDS[s], OUTS[s]
        res = f"res{s + 2}"
        for b in range(n_blocks):
            branch = "a" if b == 0 else f"b{b}"
            cin = in_ch if b == 0 else out
            npz[f"{res}/{branch}/conv1/W"] = rng.normal(
                size=(mid, cin, 1, 1)
            ).astype("f")
            bn(f"{res}/{branch}/bn1", mid)
            npz[f"{res}/{branch}/conv2/W"] = rng.normal(
                size=(mid, mid, 3, 3)
            ).astype("f")
            bn(f"{res}/{branch}/bn2", mid)
            npz[f"{res}/{branch}/conv3/W"] = rng.normal(
                size=(out, mid, 1, 1)
            ).astype("f")
            bn(f"{res}/{branch}/bn3", out)
            if b == 0:
                npz[f"{res}/{branch}/conv4/W"] = rng.normal(
                    size=(out, cin, 1, 1)
                ).astype("f")
                bn(f"{res}/{branch}/bn4", out)
        in_ch = out
    return npz


def _assert_full_coverage(params, stats, tmp_path):
    """Restore into a real ResNet-50 localizer: every tensor must load."""
    import jax
    import jax.numpy as jnp

    from loans_tpu.models import Localizer
    from loans_tpu.ops import Size
    from loans_tpu.train import (
        adam_amsgrad,
        create_train_state,
        restore_params,
        save_params,
    )

    path = str(tmp_path / "imported.msgpack")
    save_params(
        path, {"feature_extractor": params}, {"feature_extractor": stats}
    )
    localizer = Localizer(out_size=Size(8, 8), n_layers=50)
    st = create_train_state(
        localizer,
        jax.random.key(0),
        jnp.zeros((1, 64, 64, 3)),
        adam_amsgrad(1e-3),
        train=False,
    )
    new_params, new_stats = restore_params(path, st.params, st.batch_stats)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(
            st.params["feature_extractor"]
        ),
        jax.tree_util.tree_leaves_with_path(
            new_params["feature_extractor"]
        ),
    ):
        assert pa == pb
        assert not np.array_equal(np.asarray(a), np.asarray(b)), (
            f"tensor not imported: {jax.tree_util.keystr(pa)}"
        )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(
            st.batch_stats["feature_extractor"]
        ),
        jax.tree_util.tree_leaves_with_path(
            new_stats["feature_extractor"]
        ),
    ):
        assert not np.array_equal(np.asarray(a), np.asarray(b)), (
            f"stat not imported: {jax.tree_util.keystr(pa)}"
        )


@pytest.mark.slow
def test_torch_import_full_coverage(tmp_path):
    params, stats = convert_torch(fake_torch_state(np.random.default_rng(0)))
    _assert_full_coverage(params, stats, tmp_path)


@pytest.mark.slow
def test_chainer_import_full_coverage(tmp_path):
    params, stats = convert_chainer(fake_chainer_npz(np.random.default_rng(1)))
    _assert_full_coverage(params, stats, tmp_path)


def test_chainer_conv1_bgr_permute():
    rng = np.random.default_rng(2)
    npz = fake_chainer_npz(rng)
    params, _ = convert_chainer(npz)
    w = params["Conv_0"]["kernel"]  # HWIO
    # input-channel axis reversed vs the raw OIHW tensor
    raw = np.transpose(npz["conv1/W"], (2, 3, 1, 0))
    np.testing.assert_allclose(w, raw[:, :, ::-1, :])
