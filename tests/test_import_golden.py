"""Golden end-to-end validation of the pretrained-weight import path.

VERDICT r1 item 4: shape agreement is not enough — a transposed kernel
or a mis-placed downsampling stride still matches shapes. Here the same
random-but-realistic ResNet-50 weights are run through TWO independent
implementations:

  * a torch (functional) forward written directly against the
    caffe/chainer-style architecture our flax ResNet implements
    (stride on the block's first 1x1 conv, cover_all stem pool,
    BN eps 2e-5 — ``models/resnet.py``), consuming the torchvision
    state_dict naming that ``tools/import_resnet50.py::convert_torch``
    consumes;
  * our flax ResNet-50 loaded via ``convert_torch``.

Feature maps must agree to float tolerance — any transpose, BGR,
stride-placement, padding, or BN-mapping mistake in the converter (or
the model) breaks this. The chainer-npz path is validated against the
torch path: identical underlying weights expressed in chainer naming
with a BGR conv1 must convert to the identical parameter pytree
(``sheep/sheep_localizer.py:128`` pretrained default;
``iou/iou_regressor.py:11-15``).

Real ImageNet weights are unobtainable in this environment (no network
egress, none on disk) — these fixtures are the strongest available
substitute and would catch exactly the conversion bugs real weights
would hit.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from import_resnet50 import BLOCKS, convert_chainer, convert_torch  # noqa: E402

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

MIDS = (64, 128, 256, 512)
OUTS = (256, 512, 1024, 2048)
STRIDES = (1, 2, 2, 2)


def realistic_torch_state(seed=0):
    """Random weights with He-scaled convs and tame BN stats, so a
    50-layer forward stays in float32 range."""
    rng = np.random.default_rng(seed)
    state = {}

    def conv(name, cout, cin, k):
        # gain < 1 keeps 53 layers of activations near O(1), so float32
        # divergence between torch and XLA stays far below tolerance
        fan_in = cin * k * k
        state[name] = (
            rng.normal(size=(cout, cin, k, k)) * np.sqrt(1.0 / fan_in)
        ).astype("f")

    def bn(prefix, ch):
        state[prefix + ".weight"] = rng.uniform(0.7, 1.3, size=(ch,)).astype("f")
        state[prefix + ".bias"] = (rng.normal(size=(ch,)) * 0.1).astype("f")
        state[prefix + ".running_mean"] = (
            rng.normal(size=(ch,)) * 0.1
        ).astype("f")
        state[prefix + ".running_var"] = rng.uniform(
            0.5, 1.5, size=(ch,)
        ).astype("f")

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    in_ch = 64
    for s, n_blocks in enumerate(BLOCKS):
        mid, out = MIDS[s], OUTS[s]
        for b in range(n_blocks):
            t = f"layer{s + 1}.{b}"
            cin = in_ch if b == 0 else out
            conv(f"{t}.conv1.weight", mid, cin, 1)
            bn(f"{t}.bn1", mid)
            conv(f"{t}.conv2.weight", mid, mid, 3)
            bn(f"{t}.bn2", mid)
            conv(f"{t}.conv3.weight", out, mid, 1)
            bn(f"{t}.bn3", out)
            if b == 0:
                conv(f"{t}.downsample.0.weight", out, cin, 1)
                bn(f"{t}.downsample.1", out)
        in_ch = out
    return state


def torch_caffe_resnet50_forward(state, x_nchw):
    """Independent eval-mode forward of the caffe-style ResNet-50."""

    def t(k):
        return torch.from_numpy(np.asarray(state[k]))

    def bn(x, p):
        return F.batch_norm(
            x, t(p + ".running_mean"), t(p + ".running_var"),
            t(p + ".weight"), t(p + ".bias"), training=False, eps=2e-5,
        )

    x = F.conv2d(x_nchw, t("conv1.weight"), stride=2, padding=3)
    x = F.relu(bn(x, "bn1"))
    # chainer cover_all pooling == torch ceil_mode
    x = F.max_pool2d(x, 3, stride=2, padding=0, ceil_mode=True)
    for s, n_blocks in enumerate(BLOCKS):
        for b in range(n_blocks):
            p = f"layer{s + 1}.{b}"
            stride = STRIDES[s] if b == 0 else 1
            h = F.relu(bn(F.conv2d(x, t(p + ".conv1.weight"),
                                   stride=stride), p + ".bn1"))
            h = F.relu(bn(F.conv2d(h, t(p + ".conv2.weight"),
                                   padding=1), p + ".bn2"))
            h = bn(F.conv2d(h, t(p + ".conv3.weight")), p + ".bn3")
            if b == 0:
                sc = bn(
                    F.conv2d(x, t(p + ".downsample.0.weight"),
                             stride=stride),
                    p + ".downsample.1",
                )
                x = F.relu(h + sc)
            else:
                x = F.relu(h + x)
    return x


def chainer_npz_from_torch_state(state):
    """The same weights in chainer ResNet50Layers naming, conv1 in BGR
    (caffe order) — converting it must exactly undo the BGR fold."""
    npz = {}

    def put_bn(dst, src):
        npz[dst + "/gamma"] = state[src + ".weight"]
        npz[dst + "/beta"] = state[src + ".bias"]
        npz[dst + "/avg_mean"] = state[src + ".running_mean"]
        npz[dst + "/avg_var"] = state[src + ".running_var"]

    npz["conv1/W"] = state["conv1.weight"][:, ::-1, :, :]  # RGB -> BGR
    put_bn("bn1", "bn1")
    for s, n_blocks in enumerate(BLOCKS):
        res = f"res{s + 2}"
        for b in range(n_blocks):
            t = f"layer{s + 1}.{b}"
            branch = "a" if b == 0 else f"b{b}"
            for ci in range(3):
                npz[f"{res}/{branch}/conv{ci + 1}/W"] = state[
                    f"{t}.conv{ci + 1}.weight"
                ]
                put_bn(f"{res}/{branch}/bn{ci + 1}", f"{t}.bn{ci + 1}")
            if b == 0:
                npz[f"{res}/{branch}/conv4/W"] = state[
                    f"{t}.downsample.0.weight"
                ]
                put_bn(f"{res}/{branch}/bn4", f"{t}.downsample.1")
    return npz


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_equal(a[k], b[k], path + "/" + str(k))
        return
    np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b), err_msg=path
    )


def test_torch_import_feature_equality():
    import jax
    import jax.numpy as jnp

    from loans_tpu.models.resnet import ResNet

    state = realistic_torch_state()
    params, stats = convert_torch(state)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 64, 64, 3)).astype("f")

    with torch.no_grad():
        ref = torch_caffe_resnet50_forward(
            state, torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        )
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))  # NCHW -> NHWC

    model = ResNet(50)
    ours = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x),
            train=False,
        )
    )
    assert ours.shape == ref.shape
    # scale-aware tolerance: torch and XLA reassociate float32 reductions
    # differently; a layout/transpose/BGR/stride bug produces O(1)
    # relative disagreement, not ppm-level noise
    scale = float(np.std(ref))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3 * scale)
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999999, corr


def test_chainer_import_matches_torch_import():
    state = realistic_torch_state()
    p_torch, s_torch = convert_torch(state)
    npz = chainer_npz_from_torch_state(state)
    p_chainer, s_chainer = convert_chainer(npz)
    _tree_equal(p_torch, p_chainer)
    _tree_equal(s_torch, s_chainer)
