"""VGG16 import: synthetic torchvision checkpoint maps onto every
backbone conv of the SSD VGG16Extractor."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from import_vgg16 import FEATURE_CONVS, convert_vgg16  # noqa: E402

CHS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)


def fake_vgg16_state(rng):
    state = {}
    cin = 3
    for idx, ch in zip(FEATURE_CONVS, CHS):
        state[f"features.{idx}.weight"] = rng.normal(
            size=(ch, cin, 3, 3)
        ).astype("f")
        state[f"features.{idx}.bias"] = rng.normal(size=(ch,)).astype("f")
        cin = ch
    state["classifier.0.weight"] = rng.normal(
        size=(4096, 512 * 7 * 7)
    ).astype("f")
    state["classifier.0.bias"] = rng.normal(size=(4096,)).astype("f")
    state["classifier.3.weight"] = rng.normal(size=(4096, 4096)).astype("f")
    state["classifier.3.bias"] = rng.normal(size=(4096,)).astype("f")
    return state


def test_convert_shapes():
    params = convert_vgg16(fake_vgg16_state(np.random.default_rng(0)))
    assert params["Conv_0"]["kernel"].shape == (3, 3, 3, 64)
    assert params["Conv_12"]["kernel"].shape == (3, 3, 512, 512)
    assert params["Conv_13"]["kernel"].shape == (3, 3, 512, 1024)
    assert params["Conv_14"]["kernel"].shape == (1, 1, 1024, 1024)
    assert params["Conv_13"]["bias"].shape == (1024,)


@pytest.mark.slow
def test_full_coverage_into_ssd(tmp_path):
    import jax
    import jax.numpy as jnp

    from loans_tpu.models import SSD300
    from loans_tpu.train import create_train_state, restore_params, save_params
    from loans_tpu.train.ssd_steps import ssd_optimizer

    params = convert_vgg16(fake_vgg16_state(np.random.default_rng(1)))
    path = str(tmp_path / "vgg.msgpack")
    save_params(path, {"VGG16Extractor_0": params})

    model = SSD300(n_fg_class=1)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 300, 300, 3)),
        ssd_optimizer(1e-4), train=False,
    )
    new_params, _ = restore_params(path, state.params)
    old = state.params["VGG16Extractor_0"]
    new = new_params["VGG16Extractor_0"]
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(old),
        jax.tree_util.tree_leaves_with_path(new),
    ):
        assert pa == pb
        if "L2Norm" in jax.tree_util.keystr(pa):
            continue  # not part of the pretrained backbone
        assert not np.array_equal(np.asarray(a), np.asarray(b)), (
            f"not imported: {jax.tree_util.keystr(pa)}"
        )
