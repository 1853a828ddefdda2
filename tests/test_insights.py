"""Tests for VisualBackprop, BBoxPlotter, image streaming, media tools."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from loans_tpu.insights import (
    BBoxPlotter,
    ImageClient,
    ImageServer,
    draw_boxes_on_image,
    flatten_vbp,
    visual_backprop,
)
from loans_tpu.models import Localizer, ResnetAssessor
from loans_tpu.models.resnet import ResNet, resnet_vbp_ladder
from loans_tpu.ops import Size


def test_sown_vbp_matches_ladder_resnet18():
    model = ResNet(18)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.key(0), x, train=False)
    _, state = model.apply(
        vars_, x, train=False, mutable=["vbp"]
    )
    inputs = flatten_vbp(state["vbp"])
    ladder = resnet_vbp_ladder(18)
    assert len(inputs) == len(ladder)
    # shallowest-first ordering: spatial dims must be non-increasing
    sizes = [int(v.shape[1]) for v in inputs]
    assert sizes == sorted(sizes, reverse=True)


def test_visual_backprop_shape_and_range():
    model = ResNet(18)
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    vars_ = model.init(jax.random.key(0), x, train=False)
    feat, state = model.apply(vars_, x, train=False, mutable=["vbp"])
    heat = visual_backprop(
        feat, flatten_vbp(state["vbp"]), resnet_vbp_ladder(18)
    )
    assert heat.shape == (2, 64, 64, 1)
    h = np.asarray(heat)
    assert np.all(h >= 0.0) and np.all(h <= 1.0 + 1e-6)
    assert np.isfinite(h).all()


def test_localizer_vbp_ladder_counts():
    img, crop = Size(64, 64), Size(16, 16)
    loc = Localizer(out_size=crop, n_layers=18, input_size=img)
    x = jnp.zeros((1, img.height, img.width, 3))
    vars_ = loc.init(jax.random.key(0), x, train=False)
    _, state = loc.apply(
        vars_, x, train=False, mutable=["vbp", "vbp_anchor"]
    )
    inputs = flatten_vbp(state["vbp"])
    assert len(inputs) == len(loc.vbp_ladder())


def test_draw_boxes():
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    out = draw_boxes_on_image(
        img, np.array([[4, 4, 20, 20.0]]), gt_boxes=np.array([[2, 2, 10, 10.0]])
    )
    arr = np.asarray(out)
    assert arr.shape == (32, 32, 3)
    assert arr.sum() > 0  # something was drawn


def test_bbox_plotter_composes_and_saves(tmp_path):
    img, crop = Size(32, 32), Size(8, 8)
    localizer = Localizer(out_size=crop, n_layers=18, input_size=img)
    assessor = ResnetAssessor(ch=4)
    rng = jax.random.key(0)
    from loans_tpu.train import adam_amsgrad, create_train_state

    loc_state = create_train_state(
        localizer, rng, jnp.zeros((1, 32, 32, 3)), adam_amsgrad(1e-3),
        train=False,
    )
    ass_state = create_train_state(
        assessor, rng, jnp.zeros((1, 8, 8, 3)), adam_amsgrad(1e-3)
    )

    class FakeTrainer:
        pass

    t = FakeTrainer()
    t.loc_state = loc_state
    t.ass_state = ass_state
    t.bbox_vis_enabled = True

    image = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(
        np.float32
    )
    plotter = BBoxPlotter(
        localizer,
        assessor,
        image,
        str(tmp_path),
        gt_bbox=np.array([[4, 4, 20, 20.0]]),
    )
    canvas = plotter(t, 0)
    assert (tmp_path / "bboxes" / "0.png").exists()
    assert canvas.width > canvas.height  # multi-tile horizontal canvas


def test_image_stream_roundtrip():
    received = []
    done = threading.Event()

    def on_image(img, title):
        received.append((img.size, title))
        done.set()

    server = ImageServer(host="127.0.0.1", port=0, on_image=on_image)
    server.start()
    try:
        client = ImageClient("127.0.0.1", server.port)
        ok = client.send(Image.new("RGB", (20, 10), (255, 0, 0)), "t5")
        assert ok
        assert done.wait(5.0)
        assert received[0] == ((20, 10), "t5")
    finally:
        server.stop()


def test_image_client_self_disables():
    client = ImageClient("127.0.0.1", 1)  # nothing listens on port 1
    assert not client.send(Image.new("RGB", (4, 4)))
    assert not client.enabled
    client.enable_send()
    assert client.enabled


def test_make_gif(tmp_path):
    from loans_tpu.insights.media import make_gif

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in [0, 10, 2]:
        Image.new("RGB", (16, 16), (i * 20, 0, 0)).save(
            frames / f"{i}.png"
        )
    dest = make_gif(str(frames), str(tmp_path / "out.gif"), fps=5)
    gif = Image.open(dest)
    assert gif.n_frames == 3


def test_make_video(tmp_path):
    from loans_tpu.insights.media import make_video

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(5):
        Image.new("RGB", (32, 32), (i * 40, 10, 10)).save(
            frames / f"{i}.png"
        )
    dest = make_video(str(frames), str(tmp_path / "out.mp4"), fps=5)
    import os

    assert os.path.getsize(dest) > 500
