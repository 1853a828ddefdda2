"""Convert pretrained ResNet-50 weights into loans_tpu format.

The reference's default localizer is ImageNet-initialized
(``Resnet50SheepLocalizer``: chainer ``ResNet50Layers`` with
``pretrained_model='auto'``, ``sheep/sheep_localizer.py:128``). This
tool produces the equivalent starting point: a ``--pretrained-model``
msgpack for ``train_sheep_localizer.py`` from either

  * a torch(vision) ResNet-50 ``state_dict`` checkpoint (``.pth``), or
  * a chainer ``ResNet50Layers`` npz (caffe-converted; BGR conv1 is
    permuted to RGB to match our on-device preprocessing — the reference
    instead permutes every input batch through ``resnet.prepare``).

Both torchvision and chainer ResNet-50 have identical weight shapes;
they differ only in downsampling-stride placement (torchvision: 3x3
conv; caffe/chainer/ours: first 1x1 conv), which does not affect weight
transfer. This environment has no network egress, so the checkpoint must
already be on disk.

Usage:
  python tools/import_resnet50.py weights.pth out.msgpack --source torch
  python tools/import_resnet50.py ResNet-50-model.npz out.msgpack --source chainer
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys

import numpy as np

BLOCKS = (3, 4, 6, 3)


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = np.ascontiguousarray(value)


def convert_torch(state: dict) -> tuple[dict, dict]:
    """torchvision resnet50 state_dict -> (params, batch_stats)."""
    params: dict = {}
    stats: dict = {}

    def conv_bn(src_conv, src_bn, dst_prefix, permute_rgb=False):
        w = np.asarray(state[src_conv + ".weight"])
        if permute_rgb:
            pass  # torchvision is already RGB
        _set(params, dst_prefix + ["Conv_0", "kernel"], _oihw_to_hwio(w))
        _set(params, dst_prefix + ["BatchNorm_0", "scale"],
             np.asarray(state[src_bn + ".weight"]))
        _set(params, dst_prefix + ["BatchNorm_0", "bias"],
             np.asarray(state[src_bn + ".bias"]))
        _set(stats, dst_prefix + ["BatchNorm_0", "mean"],
             np.asarray(state[src_bn + ".running_mean"]))
        _set(stats, dst_prefix + ["BatchNorm_0", "var"],
             np.asarray(state[src_bn + ".running_var"]))

    # stem (our ResNet keeps stem conv/bn at module top level)
    w = _oihw_to_hwio(np.asarray(state["conv1.weight"]))
    _set(params, ["Conv_0", "kernel"], w)
    _set(params, ["BatchNorm_0", "scale"], np.asarray(state["bn1.weight"]))
    _set(params, ["BatchNorm_0", "bias"], np.asarray(state["bn1.bias"]))
    _set(stats, ["BatchNorm_0", "mean"],
         np.asarray(state["bn1.running_mean"]))
    _set(stats, ["BatchNorm_0", "var"],
         np.asarray(state["bn1.running_var"]))

    for s, n_blocks in enumerate(BLOCKS):
        stage = f"BottleNeckStage_{s}"
        for b in range(n_blocks):
            t = f"layer{s + 1}.{b}"
            if b == 0:
                block = [stage, "BottleNeckA_0"]
                for ci in range(3):
                    conv_bn(f"{t}.conv{ci + 1}", f"{t}.bn{ci + 1}",
                            block + [f"ConvBN_{ci}"])
                conv_bn(f"{t}.downsample.0", f"{t}.downsample.1",
                        block + ["ConvBN_3"])
            else:
                block = [stage, f"BottleNeckB_{b - 1}"]
                for ci in range(3):
                    conv_bn(f"{t}.conv{ci + 1}", f"{t}.bn{ci + 1}",
                            block + [f"ConvBN_{ci}"])
    return params, stats


def convert_chainer(npz: dict) -> tuple[dict, dict]:
    """chainer ResNet50Layers npz -> (params, batch_stats).

    chainer names: conv1/W, bn1/{gamma,beta,avg_mean,avg_var};
    res{2..5}/{a,b1,b2,...}/conv{1..3}/W + bn{1..3}/...;
    branch naming: a = first block (with conv4/bn4 projection).
    Caffe-order conv1 is BGR: permuted to RGB here.
    """

    def g(key):
        return np.asarray(npz[key])

    params: dict = {}
    stats: dict = {}

    w = _oihw_to_hwio(g("conv1/W"))
    w = w[:, :, ::-1, :]  # BGR -> RGB input channels
    _set(params, ["Conv_0", "kernel"], w)
    _set(params, ["BatchNorm_0", "scale"], g("bn1/gamma"))
    _set(params, ["BatchNorm_0", "bias"], g("bn1/beta"))
    _set(stats, ["BatchNorm_0", "mean"], g("bn1/avg_mean"))
    _set(stats, ["BatchNorm_0", "var"], g("bn1/avg_var"))

    for s, n_blocks in enumerate(BLOCKS):
        stage = f"BottleNeckStage_{s}"
        res = f"res{s + 2}"
        for b in range(n_blocks):
            branch = "a" if b == 0 else f"b{b}"
            dst = (
                [stage, "BottleNeckA_0"]
                if b == 0
                else [stage, f"BottleNeckB_{b - 1}"]
            )
            n_convs = 4 if b == 0 else 3
            for ci in range(n_convs):
                src = f"{res}/{branch}/conv{ci + 1}"
                srcbn = f"{res}/{branch}/bn{ci + 1}"
                p = dst + [f"ConvBN_{ci}"]
                _set(params, p + ["Conv_0", "kernel"],
                     _oihw_to_hwio(g(src + "/W")))
                _set(params, p + ["BatchNorm_0", "scale"], g(srcbn + "/gamma"))
                _set(params, p + ["BatchNorm_0", "bias"], g(srcbn + "/beta"))
                _set(stats, p + ["BatchNorm_0", "mean"], g(srcbn + "/avg_mean"))
                _set(stats, p + ["BatchNorm_0", "var"], g(srcbn + "/avg_var"))
    return params, stats


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", help=".pth (torch) or .npz (chainer)")
    p.add_argument("output", help="output msgpack")
    p.add_argument("--source", choices=["torch", "chainer"], default=None)
    p.add_argument("--verify", action="store_true",
                   help="load the result into a Localizer and forward-check")
    args = p.parse_args(argv)

    source = args.source
    if source is None:
        source = "chainer" if args.checkpoint.endswith(".npz") else "torch"

    if source == "torch":
        import torch

        state = torch.load(
            args.checkpoint, map_location="cpu", weights_only=True
        )
        state = {k: v.numpy() for k, v in state.items()}
        params, stats = convert_torch(state)
    else:
        npz = np.load(args.checkpoint)
        params, stats = convert_chainer(npz)

    # wrap under the Localizer's backbone module name
    payload_params = {"feature_extractor": params}
    payload_stats = {"feature_extractor": stats}
    from loans_tpu.train.checkpoint import save_params

    save_params(args.output, payload_params, payload_stats)
    n = sum(
        np.asarray(v).size
        for v in _leaves(payload_params)
    )
    print(f"wrote {args.output} ({n / 1e6:.1f}M params)")

    if args.verify:
        import jax
        import jax.numpy as jnp

        from loans_tpu.models import Localizer
        from loans_tpu.ops import Size
        from loans_tpu.train import (
            adam_amsgrad,
            create_train_state,
            restore_params,
        )

        localizer = Localizer(out_size=Size(75, 75), n_layers=50)
        st = create_train_state(
            localizer, jax.random.key(0),
            jnp.zeros((1, 224, 224, 3)), adam_amsgrad(1e-3), train=False,
        )
        new_params, new_stats = restore_params(
            args.output, st.params, st.batch_stats
        )
        # every backbone leaf must have been overwritten
        changed = 0
        total = 0
        for a, b in zip(
            _leaves(st.params["feature_extractor"]),
            _leaves(new_params["feature_extractor"]),
        ):
            total += 1
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                changed += 1
        print(f"verify: {changed}/{total} backbone tensors imported")
        if changed != total:
            print("WARNING: some tensors kept their fresh init "
                  "(name/shape mismatch)")
            sys.exit(1)


def _leaves(tree):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _leaves(tree[k])
    else:
        yield tree


if __name__ == "__main__":
    main()
