"""SSD inference wrapper + CLI dispatch tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loans_tpu.train import checkpoint, create_train_state, save_state


@pytest.fixture(scope="module")
def ssd_log_dir(tmp_path_factory):
    from loans_tpu.models import SSD300
    from loans_tpu.train.ssd_steps import ssd_optimizer

    log_dir = str(tmp_path_factory.mktemp("ssdlog"))
    model = SSD300(n_fg_class=1)
    state = create_train_state(
        model,
        jax.random.key(0),
        jnp.zeros((1, 300, 300, 3)),
        ssd_optimizer(1e-4),
        train=False,
    )
    save_state(f"{log_dir}/SSD300_0.msgpack", state)
    checkpoint.save_manifest(
        log_dir,
        {
            "localizer": {"model": "SSD300", "kwargs": {"n_fg_class": 1}},
            "snapshot_names": ["SSD300"],
            "config": {},
        },
    )
    return log_dir


def test_load_inference_dispatch(ssd_log_dir, tmp_path):
    from loans_tpu.inference.localizer import LocalizerInference
    from loans_tpu.inference.ssd import SSDInference, load_inference

    wrapper = load_inference(ssd_log_dir, use_assessor=True)
    assert isinstance(wrapper, SSDInference)

    # a localizer manifest dispatches to LocalizerInference
    from loans_tpu.models import Localizer
    from loans_tpu.ops import Size
    from loans_tpu.train import adam_amsgrad

    loc_dir = str(tmp_path / "loc")
    localizer = Localizer(out_size=Size(8, 8), n_layers=18,
                          input_size=Size(32, 32))
    state = create_train_state(
        localizer, jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
        adam_amsgrad(1e-3), train=False,
    )
    save_state(f"{loc_dir}/Localizer_0.msgpack", state)
    checkpoint.save_manifest(
        loc_dir,
        {
            "localizer": {
                "model": "Localizer",
                "kwargs": {
                    "out_size": [8, 8], "n_layers": 18,
                    "input_size": [32, 32],
                },
            },
            "snapshot_names": ["Localizer"],
            "config": {},
        },
    )
    wrapper = load_inference(loc_dir)
    assert isinstance(wrapper, LocalizerInference)


@pytest.mark.slow
def test_ssd_localize_shapes(ssd_log_dir):
    from loans_tpu.inference.ssd import SSDInference

    ssd = SSDInference(ssd_log_dir, score_threshold=0.0)
    image = np.zeros((300, 300, 3), dtype=np.float32)
    boxes, rois, scores, heat = ssd.localize(image)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert rois is None and heat is None
    assert len(scores) == len(boxes)
    frame = np.zeros((300, 300, 3), dtype=np.uint8)
    out = ssd.visualize_results(frame, boxes[:5], scores[:5])
    assert out.shape == frame.shape