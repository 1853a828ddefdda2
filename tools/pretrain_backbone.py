"""Pretrain a ResNet-50 backbone as a classifier on procedural scenes.

The reference's default localizer starts from an ImageNet-pretrained
backbone (``sheep/sheep_localizer.py:128``, ``pretrained_model='auto'``)
and its ``sheep/resnet.py:60-67`` carries a classifier head +
``train_imagenet`` mode for producing such weights. This box has no
ImageNet weights and no egress, so this tool produces the equivalent
artifact from the procedural world: it trains ``ResNet(n_layers=50,
class_labels=K)`` to classify WHICH stamp a scene contains (K procedural
stamp classes pasted on procedural backgrounds at 224x224), then exports
the backbone in torchvision ``resnet50`` state_dict layout so the result
flows through the real import path::

  python tools/pretrain_backbone.py --out /tmp/pre/backbone.pth
  python tools/import_resnet50.py /tmp/pre/backbone.pth pre.msgpack --verify
  python train_sheep_localizer.py ... --n-layers 50 --pretrained-model pre.msgpack

Training uses the same TPU idiom as the main trainer: HBM-resident
scene pool, K scanned iterations per dispatch, index-only host->device
traffic. Preprocessing matches the Localizer exactly (x*255 - ImageNet
RGB mean, ``models/localizer.py:103-104``) so the transferred features
see the distribution they were trained on.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


# -- torchvision-layout export -------------------------------------------

BLOCKS = (3, 4, 6, 3)


def _hwio_to_oihw(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1))


def export_torchvision_resnet50(params: dict, stats: dict) -> dict:
    """flax ResNet-50 (params, batch_stats) -> torchvision state_dict.

    Exact inverse of ``tools/import_resnet50.convert_torch`` (same key
    map, transposed): stem ``Conv_0``/``BatchNorm_0`` -> ``conv1``/
    ``bn1``; ``BottleNeckStage_{s}/BottleNeckA_0/ConvBN_{0..2}`` ->
    ``layer{s+1}.0.conv{1..3}``, ``ConvBN_3`` -> downsample;
    ``BottleNeckB_{b-1}`` -> ``layer{s+1}.{b}``. The classifier head
    (``Dense_0``) is dropped — only the backbone transfers, like
    chainer's ``ResNet50Layers`` feature extractor.
    """
    out: dict[str, np.ndarray] = {}

    def put_conv_bn(p_node, s_node, conv_name, bn_name):
        out[conv_name + ".weight"] = _hwio_to_oihw(p_node["Conv_0"]["kernel"])
        bn_p = p_node["BatchNorm_0"]
        bn_s = s_node["BatchNorm_0"]
        out[bn_name + ".weight"] = np.asarray(bn_p["scale"], np.float32)
        out[bn_name + ".bias"] = np.asarray(bn_p["bias"], np.float32)
        out[bn_name + ".running_mean"] = np.asarray(bn_s["mean"], np.float32)
        out[bn_name + ".running_var"] = np.asarray(bn_s["var"], np.float32)
        out[bn_name + ".num_batches_tracked"] = np.asarray(0, np.int64)

    # stem lives at module top level in our ResNet
    out["conv1.weight"] = _hwio_to_oihw(params["Conv_0"]["kernel"])
    out["bn1.weight"] = np.asarray(params["BatchNorm_0"]["scale"], np.float32)
    out["bn1.bias"] = np.asarray(params["BatchNorm_0"]["bias"], np.float32)
    out["bn1.running_mean"] = np.asarray(stats["BatchNorm_0"]["mean"], np.float32)
    out["bn1.running_var"] = np.asarray(stats["BatchNorm_0"]["var"], np.float32)
    out["bn1.num_batches_tracked"] = np.asarray(0, np.int64)

    for s, n_blocks in enumerate(BLOCKS):
        stage_p = params[f"BottleNeckStage_{s}"]
        stage_s = stats[f"BottleNeckStage_{s}"]
        for b in range(n_blocks):
            t = f"layer{s + 1}.{b}"
            key = "BottleNeckA_0" if b == 0 else f"BottleNeckB_{b - 1}"
            block_p, block_s = stage_p[key], stage_s[key]
            for ci in range(3):
                put_conv_bn(
                    block_p[f"ConvBN_{ci}"], block_s[f"ConvBN_{ci}"],
                    f"{t}.conv{ci + 1}", f"{t}.bn{ci + 1}",
                )
            if b == 0:
                put_conv_bn(
                    block_p["ConvBN_3"], block_s["ConvBN_3"],
                    f"{t}.downsample.0", f"{t}.downsample.1",
                )
    return out


# -- labeled scene pool ---------------------------------------------------

def make_scene_pool(n: int, classes: int, asset_seed: int, seed: int,
                    image_size=(224, 224)) -> dict:
    """(n, H, W, 3) uint8 scenes + (n,) int32 stamp-class labels."""
    from loans_tpu.data.synthetic import PasteAndCropGenerator

    gen = PasteAndCropGenerator(
        image_size=image_size, n_procedural=classes,
        asset_seed=asset_seed, seed=seed,
    )
    images = np.empty((n, image_size[1], image_size[0], 3), np.uint8)
    labels = np.empty((n,), np.int32)
    for i in range(n):
        cls = gen.rng.randrange(classes)
        result = gen.paste(stamp_index=cls)
        images[i] = np.asarray(result.image.convert("RGB"), np.uint8)
        labels[i] = cls
    return {"images": images, "labels": labels}


# -- training -------------------------------------------------------------

def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--classes", type=int, default=64)
    p.add_argument("--pool", type=int, default=8192)
    p.add_argument("--val-pool", type=int, default=1024)
    p.add_argument("--iterations", type=int, default=4000)
    p.add_argument("-b", "--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--asset-seed", type=int, default=None,
                   help="share a visual world with the main trainer's "
                        "--synthetic-assets (pass the same value)")
    p.add_argument("--steps-per-call", type=int, default=50)
    p.add_argument("--log-interval", type=int, default=500)
    p.add_argument("--pool-refresh", type=int, default=0,
                   help="regenerate the train pool every N chunks "
                        "(0 = fixed pool)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from loans_tpu.data.device_data import device_chunk_batches
    from loans_tpu.models.localizer import IMAGENET_MEAN_RGB
    from loans_tpu.models.resnet import ResNet
    from loans_tpu.parallel import create_mesh, replicate
    from loans_tpu.train import adam_amsgrad, create_train_state
    from loans_tpu.train.steps import make_pooled_train_step

    asset_seed = args.asset_seed if args.asset_seed is not None else args.seed
    t0 = time.time()
    print(f"generating {args.pool}+{args.val_pool} labeled scenes "
          f"({args.classes} classes)...", flush=True)
    train_pool = make_scene_pool(
        args.pool, args.classes, asset_seed, seed=args.seed
    )
    val_pool = make_scene_pool(
        args.val_pool, args.classes, asset_seed, seed=args.seed + 1
    )
    print(f"pools ready in {time.time() - t0:.0f}s", flush=True)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = ResNet(
        n_layers=50, class_labels=args.classes,
        dtype=dtype, norm_dtype=dtype,
    )
    mesh = create_mesh()
    state = create_train_state(
        model, jax.random.key(args.seed),
        jnp.zeros((2, 224, 224, 3), dtype), adam_amsgrad(args.lr),
        train=False,
    )
    state = replicate(mesh, state)
    mean = jnp.asarray(IMAGENET_MEAN_RGB, dtype)

    def preprocess(u8):
        # Localizer convention: x(in [0,1])*255 - mean == u8 - mean
        # (models/localizer.py:103-104)
        return u8.astype(dtype) - mean

    def body(state, _none, batch, rng):
        x = preprocess(batch["images"])
        # the one augmentation the paste pipeline can't bake in cheaply
        flip = jax.random.bernoulli(rng, shape=(x.shape[0], 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)
        y = batch["labels"]

        def loss_fn(params):
            logits, new_model_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            logits = logits.astype(jnp.float32)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()
            acc = jnp.mean(jnp.argmax(logits, -1) == y)
            return loss, (new_model_state["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, _none, {"loss": loss, "acc": acc}

    step = make_pooled_train_step(body, args.steps_per_call)

    refresh = None
    if args.pool_refresh:
        def factory(generation: int):
            return make_scene_pool(
                args.pool, args.classes, asset_seed,
                seed=args.seed + 100 + generation,
            )
        refresh = {"cls": (factory, args.pool_refresh)}

    chunks = device_chunk_batches(
        mesh, {"cls": train_pool}, args.batch_size,
        args.steps_per_call, seed=args.seed, refresh=refresh,
    )

    @jax.jit
    def eval_logits(state, images):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            preprocess(images), train=False,
        ).astype(jnp.float32)

    def val_accuracy(state):
        correct = total = 0
        n = (len(val_pool["labels"]) // args.batch_size) * args.batch_size
        for start in range(0, n, args.batch_size):
            sl = slice(start, start + args.batch_size)
            logits = eval_logits(state, jnp.asarray(val_pool["images"][sl]))
            pred = np.argmax(np.asarray(logits), -1)
            correct += int((pred == val_pool["labels"][sl]).sum())
            total += args.batch_size
        return correct / max(total, 1)

    rng = jax.random.key(args.seed + 7)
    done = 0
    decayed = False
    t0 = time.time()
    while done < args.iterations:
        if not decayed and done >= int(args.iterations * 0.75):
            state = state.with_learning_rate(args.lr * 0.1)
            decayed = True
        rng, step_rng = jax.random.split(rng)
        state, _, metrics = step(state, None, next(chunks), step_rng)
        done += args.steps_per_call
        if done % args.log_interval < args.steps_per_call:
            metrics = jax.tree_util.tree_map(float, metrics)
            ips = done * args.batch_size / (time.time() - t0)
            print(
                f"iter={done}  loss={metrics['loss']:.4f}  "
                f"acc={metrics['acc']:.4f}  images_per_sec={ips:.1f}",
                flush=True,
            )

    vacc = val_accuracy(state)
    print(f"final train acc={metrics['acc']:.4f}  val acc={vacc:.4f}")

    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    sd = export_torchvision_resnet50(params, stats)

    import torch

    _os.makedirs(_os.path.dirname(_os.path.abspath(args.out)), exist_ok=True)
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               args.out)
    print(f"wrote {args.out} ({len(sd)} tensors, val_acc={vacc:.4f})")


if __name__ == "__main__":
    main()
