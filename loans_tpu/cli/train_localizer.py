"""Unsupervised localizer+assessor training CLI.

Parity with ``train_sheep_localizer.py`` (argparse surface :51-76,
wiring :85-255): builds the unlabeled train set, the labeled assessor
("reference") set and the validation set; localizer + assessor with two
Adam(amsgrad) optimizers; the alternating update; a timestamped
``<log_dir>/<timestamp>_<name>`` run dir with JSON log, manifest,
snapshots, in-training mAP eval, BBoxPlotter, and the interactive /
control-file command channel.

TPU-first: one jitted alternating step over a data-parallel mesh;
``--reference-file synthetic`` replaces the reference's MNIST quick mode
(:94-96) as the download-free end-to-end smoke path.
"""

from __future__ import annotations

import argparse
import datetime
import os

import jax
import jax.numpy as jnp
import numpy as np


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="train a localizer with an assessor (LoANs, TPU-native)"
    )
    p.add_argument("train_file", help="txt/csv of unlabeled train images, "
                   "or 'synthetic[:N]' for generated scenes")
    p.add_argument("reference_file", help="csv of labeled assessor crops "
                   "(path<TAB>iou), or 'synthetic[:N]' / 'mnist'")
    p.add_argument("val_file", help="csv/json of labeled validation images, "
                   "or 'synthetic[:N]'")
    p.add_argument("--batch-size", "-b", type=int, default=16)
    p.add_argument("--target-size", type=int, nargs=2, default=[224, 224],
                   help="input size (h w)")
    p.add_argument("--crop-size", type=int, nargs=2, default=[75, 75],
                   help="assessor crop size (h w)")
    p.add_argument("--n-layers", type=int, default=50, choices=[18, 34, 50],
                   help="localizer backbone depth")
    p.add_argument("--learning-rate", "-lr", type=float, default=1e-3)
    p.add_argument("--epochs", "-e", type=int, default=0,
                   help="epochs over the train set (0 = use --iterations)")
    p.add_argument("--iterations", "-it", type=int, default=1000)
    p.add_argument("--log-dir", "-l", default="logs")
    p.add_argument("--log-name", "-ln", default="training")
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--snapshot-interval", "-si", type=int, default=1000)
    p.add_argument("--keep-snapshots", type=int, default=0,
                   help="keep only the N newest snapshots (0 = all)")
    p.add_argument("--localizer-target", type=float, default=1.0)
    p.add_argument("--supervised", action="store_true",
                   help="train the localizer directly on gt boxes "
                   "(train_file must be labeled); no assessor")
    p.add_argument("--resume-localizer", "-rl", default=None)
    p.add_argument("--resume-discriminator", "-rd", default=None,
                   help="resume assessor AND freeze it (reference --rd)")
    p.add_argument("--no-freeze", action="store_true",
                   help="do not freeze the assessor when resuming it")
    p.add_argument("--pretrained-model", default=None,
                   help="backbone weights to load (head skipped)")
    p.add_argument("--rotation-dropout-ratio", type=float, default=0.0)
    p.add_argument("--assessor-refresh", type=int, default=0, metavar="N",
                   help="regenerate the synthetic assessor pool every ~N "
                   "iterations in a background thread (device-data only; "
                   "0 = fixed pool). Unbounded crop stream - prevents the "
                   "assessor from memorizing a small pool")
    p.add_argument("--assessor-ema", type=float, default=0.0,
                   metavar="DECAY",
                   help="score the localizer against an EMA of the "
                   "assessor params (decay per step, e.g. 0.99; 0 = live "
                   "params, the reference behavior). Damps the scoring-"
                   "surface jump at each --assessor-refresh pool swap")
    p.add_argument("--assessor-ema-start", type=int, default=0,
                   metavar="ITER",
                   help="iteration at which --assessor-ema starts "
                   "accumulating; before it the localizer is scored "
                   "against the live assessor (reference behavior). "
                   "Keeps early localizer/assessor co-calibration "
                   "unsmoothed - the measured EMA failure mode on "
                   "late-takeoff seeds")
    p.add_argument("--assessor-low-iou", type=float, default=0.0,
                   metavar="FRAC",
                   help="fraction of synthetic assessor crops sampled as "
                   "unconstrained random crops (mostly IoU~0 background) - "
                   "the stratified reference recipe never emits IoU<0.2, "
                   "leaving the assessor unconstrained on object-free "
                   "crops, a hole the localizer can park in")
    p.add_argument("--assessor-augment", action="store_true",
                   help="on-device flip/photometric augmentation of the "
                   "assessor's labeled crops (IoU-label preserving; "
                   "data/device_augment.py)")
    p.add_argument("--synthetic-cache", default=None, metavar="DIR",
                   help="disk-cache pre-generated synthetic datasets in "
                   "DIR keyed by their full config (a 32k assessor pool "
                   "costs 10-15 min of host generation per run otherwise)")
    p.add_argument("--synthetic-assets", type=int, default=0, metavar="N",
                   help="share ONE procedural asset world (N stamps + N "
                   "backgrounds) across the synthetic train/reference/val "
                   "datasets instead of per-dataset disjoint assets - the "
                   "reference's paste_and_crop templates are the same "
                   "object class as its unlabeled frames. 0 = legacy "
                   "per-dataset assets (16 each)")
    p.add_argument("--benchmark", choices=["default", "hard"],
                   default="default",
                   help="synthetic world difficulty: 'hard' adds unlabeled "
                   "wrong-class distractor stamps, cluttered high-frequency "
                   "backgrounds, and wider stamp scale ranges "
                   "(data/synthetic.py) - the reference proves itself on "
                   "real photos with clutter; the default benchmark has one "
                   "salient object on a muted field")
    p.add_argument("--base-bboxes", default=None, metavar="JSON",
                   help="bbox-annotation json; pasted stamps are resized to "
                   "the real gt box-size distribution instead of uniform "
                   "draws (paste_and_crop_sheep.py:111,157-175)")
    p.add_argument("--assessor-pipeline", choices=["pil", "stn"],
                   default="pil",
                   help="how synthetic assessor crops are rendered: PIL "
                   "crop+resize (reference parity) or the production STN "
                   "sampler (matches the localizer's crop distribution)")
    p.add_argument("--grayscale-rois", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute dtype (convs AND batchnorm; "
                   "params/optimizer stay float32)")
    p.add_argument("--bn-f32", action="store_true",
                   help="keep BatchNorm in float32 under --bf16 "
                   "(slower, conservative numerics)")
    p.add_argument("--plot-image", default=None,
                   help="image rendered by the BBoxPlotter each interval")
    p.add_argument("--plot-interval", type=int, default=0,
                   help="BBoxPlotter cadence (0 = off; reference: 1)")
    p.add_argument("--send-bboxes", default=None, metavar="HOST:PORT",
                   help="stream plots to a show-progress viewer")
    p.add_argument("--interactive", action="store_true",
                   help="stdin REPL (shiftlr/setlr/quit/...)")
    p.add_argument("--eval-bn-warmup", type=int, default=0, metavar="N",
                   help="re-estimate BatchNorm stats from N val batches "
                   "before each in-training eval (honest early-run "
                   "metrics; 0 = reference behavior)")
    p.add_argument("--eval-batches", type=int, default=8,
                   help="bounded in-training eval (FastEvaluator parity)")
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--device-data", choices=["auto", "on", "off"],
                   default="auto",
                   help="keep the whole dataset in HBM and gather batches "
                   "on-device by index (one int32-index transfer per step "
                   "instead of an image batch). 'auto' enables it for "
                   "in-memory synthetic datasets")
    p.add_argument("--steps-per-call", type=int, default=0,
                   help="train iterations scanned inside one jitted call "
                   "(device-data only; amortizes host dispatch). "
                   "0 = auto (8 with device data, else 1)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr-shift", type=float, nargs=4, default=None,
                   metavar=("START_LR", "TARGET_LR", "START_IT", "END_IT"),
                   help="piecewise-linear LR schedule "
                   "(TwoStateLearningRateShifter, "
                   "train_utils/train_utils.py:32-82)")
    p.add_argument("--lr-decay", type=float, nargs=2, default=None,
                   metavar=("FACTOR", "EVERY"),
                   help="multiply LR by FACTOR every EVERY iterations "
                   "(AttributeUpdater, train_utils/train_utils.py:17-29)")
    p.add_argument("--dump-graph", action="store_true",
                   help="write the lowered train-step StableHLO to "
                   "<log_dir>/train_step.hlo.txt (the reference dumps "
                   "model.dot, train_sheep_localizer.py:248)")
    p.add_argument("--profile", type=int, nargs=2, default=None,
                   metavar=("START", "STEPS"),
                   help="capture a JAX profiler trace for STEPS "
                   "iterations starting at START")
    return p


def _is_synthetic(spec: str) -> bool:
    return spec.startswith("synthetic") or spec == "mnist"


def _synthetic_n(spec: str, default: int) -> int:
    if ":" in spec:
        return int(spec.split(":", 1)[1])
    return default


def build_asset_kw(args):
    """Synthetic-world kwargs (asset seed, hard mode, base bboxes).

    One builder for every synthetic dataset a run constructs — train,
    assessor reference, val, and the supervised-mode labeled train set —
    so a flag like ``--benchmark hard`` can never apply to one split but
    not another (a train/eval world skew; the reference has a single
    generation config per run, ``paste_and_crop_sheep.py:157-175``).
    """
    asset_kw = {}
    if args.synthetic_assets:
        asset_kw = dict(
            asset_seed=args.seed + 9973, n_assets=args.synthetic_assets
        )
    if getattr(args, "benchmark", "default") == "hard":
        asset_kw["hard"] = True
    if getattr(args, "base_bboxes", None):
        from loans_tpu.data.synthetic import load_base_bbox_sizes

        asset_kw["base_bboxes"] = load_base_bbox_sizes(args.base_bboxes)
    return asset_kw


def build_datasets(args):
    from loans_tpu.data import (
        ImageDataset,
        LabeledImageDataset,
        SyntheticAssessorDataset,
        SyntheticLocalizerDataset,
        read_labeled_csv,
    )

    img = tuple(args.target_size)
    crop = tuple(args.crop_size)
    asset_kw = build_asset_kw(args)
    cache = getattr(args, "synthetic_cache", None)
    if _is_synthetic(args.train_file):
        from loans_tpu.data.synthetic import cached_synthetic

        n_train = _synthetic_n(args.train_file, 512)
        train = cached_synthetic(
            cache, "scenes",
            lambda items: SyntheticLocalizerDataset(
                n_train, image_size=img, seed=args.seed,
                output_dtype="uint8", items=items, **asset_kw,
            ),
            n=n_train, image_size=list(img), seed=args.seed,
            labeled=False, **{k: str(v) for k, v in asset_kw.items()},
        )
    else:
        train = ImageDataset(
            args.train_file, image_size=img, seed=args.seed
        )
    if _is_synthetic(args.reference_file):
        from loans_tpu.data.synthetic import cached_synthetic

        n_ref_total = _synthetic_n(args.reference_file, 1024)
        pipeline = getattr(args, "assessor_pipeline", "pil")
        reference = cached_synthetic(
            cache, "crops",
            lambda items: SyntheticAssessorDataset(
                n_ref_total, output_size=crop, image_size=img,
                seed=args.seed + 1, output_dtype="uint8",
                crop_pipeline=pipeline,
                low_iou_fraction=args.assessor_low_iou,
                items=items, **asset_kw,
            ),
            n=n_ref_total, crop=list(crop), image_size=list(img),
            seed=args.seed + 1, pipeline=pipeline,
            low_iou=args.assessor_low_iou,
            **{k: str(v) for k, v in asset_kw.items()},
        )
    else:
        reference = LabeledImageDataset(
            read_labeled_csv(args.reference_file), image_size=crop
        )
    if _is_synthetic(args.val_file):
        from loans_tpu.data.synthetic import cached_synthetic

        n_val = _synthetic_n(args.val_file, 64)
        val = cached_synthetic(
            cache, "scenes",
            lambda items: SyntheticLocalizerDataset(
                n_val, image_size=img, seed=args.seed + 2, labeled=True,
                output_dtype="uint8", items=items, **asset_kw,
            ),
            n=n_val, image_size=list(img), seed=args.seed + 2,
            labeled=True, **{k: str(v) for k, v in asset_kw.items()},
        )
    else:
        val = LabeledImageDataset(args.val_file, image_size=img)
    return train, reference, val


def build_supervised_datasets(args):
    """(labeled train, labeled val) for ``--supervised`` mode.

    Both splits share :func:`build_asset_kw`'s world kwargs — a round-3
    skew hand-rolled the train kwargs here and silently dropped
    ``hard``/``base_bboxes``, so ``--supervised --benchmark hard``
    trained on the default world while validating on the hard one
    (val mAP 0.0008, `docs/results/logs_r3/37_hard_sup.sh.out`).
    """
    from loans_tpu.data import LabeledImageDataset
    from loans_tpu.data.synthetic import SyntheticLocalizerDataset

    img = tuple(args.target_size)
    sup_asset_kw = build_asset_kw(args)
    if _is_synthetic(args.train_file):
        train_ds = SyntheticLocalizerDataset(
            _synthetic_n(args.train_file, 512), image_size=img,
            seed=args.seed, labeled=True, output_dtype="uint8",
            **sup_asset_kw,
        )
    else:
        train_ds = LabeledImageDataset(args.train_file, image_size=img)
    # skip generating the (unused) assessor reference set
    import argparse as _ap

    val_args = _ap.Namespace(**vars(args))
    val_args.reference_file = "synthetic:1"
    _, _, val_ds = build_datasets(val_args)
    return train_ds, val_ds


def main(argv=None):
    from loans_tpu.data import DataLoader, device_prefetch
    from loans_tpu.insights import BBoxPlotter
    from loans_tpu.evaluation import MAPEvaluator
    from loans_tpu.models import Localizer, ResnetAssessor
    from loans_tpu.ops import Size
    from loans_tpu.parallel import create_mesh, replicate, shard_batch
    from loans_tpu.train import (
        AlternatingConfig,
        CommandChannel,
        Hook,
        Trainer,
        adam_amsgrad,
        checkpoint,
        create_train_state,
        make_train_step,
    )

    args = get_parser().parse_args(argv)
    img = Size(*args.target_size)
    crop = Size(*args.crop_size)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    timestamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    log_dir = os.path.join(args.log_dir, f"{timestamp}_{args.log_name}")
    os.makedirs(log_dir, exist_ok=True)

    # -- models + states ---------------------------------------------------
    localizer = Localizer(
        out_size=crop,
        n_layers=args.n_layers,
        input_size=img,
        rotation_dropout_ratio=args.rotation_dropout_ratio,
        transform_rois_to_grayscale=args.grayscale_rois,
        dtype=dtype,
        norm_dtype=jnp.float32 if (args.bn_f32 or not args.bf16) else dtype,
    )
    assessor = ResnetAssessor(dtype=dtype)
    rng = jax.random.key(args.seed)
    loc_state = create_train_state(
        localizer,
        rng,
        jnp.zeros((2, img.height, img.width, 3)),
        adam_amsgrad(args.learning_rate),
        train=False,
    )
    ass_state = create_train_state(
        assessor,
        rng,
        jnp.zeros((2, crop.height, crop.width, 3)),
        adam_amsgrad(args.learning_rate),
    )
    if args.assessor_ema:
        ass_state = ass_state.with_ema()
    if args.pretrained_model:
        params, stats = checkpoint.restore_params(
            args.pretrained_model,
            loc_state.params,
            loc_state.batch_stats,
            skip_prefixes=("param_predictor",),
        )
        loc_state = loc_state.replace(params=params, batch_stats=stats)

    # -- manifest ----------------------------------------------------------
    config = {k: v for k, v in vars(args).items()}
    checkpoint.save_manifest(
        log_dir,
        {
            "localizer": {
                "model": "Localizer",
                "kwargs": {
                    "out_size": list(crop),
                    "n_layers": args.n_layers,
                    "input_size": list(img),
                    "rotation_dropout_ratio": args.rotation_dropout_ratio,
                    "transform_rois_to_grayscale": args.grayscale_rois,
                },
            },
            "assessor": {"model": "ResnetAssessor", "kwargs": {}},
            "snapshot_names": ["Localizer", "ResnetAssessor"],
            "config": config,
        },
    )

    # -- data --------------------------------------------------------------
    if args.supervised:
        train_ds, val_ds = build_supervised_datasets(args)
        ref_ds = None
    else:
        train_ds, ref_ds, val_ds = build_datasets(args)
    mesh = create_mesh()
    n_dev = mesh.devices.size
    if args.batch_size % n_dev:
        raise SystemExit(
            f"--batch-size {args.batch_size} not divisible by "
            f"{n_dev} devices"
        )

    all_synthetic = _is_synthetic(args.train_file) and _is_synthetic(
        args.val_file
    ) and (args.supervised or _is_synthetic(args.reference_file))
    use_device_data = args.device_data == "on" or (
        args.device_data == "auto" and all_synthetic
    )

    steps_per_call = args.steps_per_call or (8 if use_device_data else 1)
    if not use_device_data:
        steps_per_call = 1
    if use_device_data:
        from loans_tpu.data.device_data import (
            device_chunk_batches,
            materialize,
        )

        refresh = None
        if args.supervised:
            groups = {"train": materialize(train_ds)}
        else:
            imgs = materialize(train_ds)[0]
            crops, labels = materialize(ref_ds)[:2]
            groups = {
                "unlabeled": {"unlabeled": imgs},
                "reference": {"real": crops, "labels": labels},
            }
            if args.assessor_refresh and _is_synthetic(args.reference_file):
                from loans_tpu.data import SyntheticAssessorDataset

                n_ref = _synthetic_n(args.reference_file, 1024)

                # the refresh pool MUST be drawn from the same world as
                # every other split — a hand-rolled kwargs dict here once
                # dropped `hard`/`base_bboxes`, so hard-benchmark weak runs
                # trained the assessor on hard crops until iteration
                # --assessor-refresh and on default-world crops after,
                # collapsing at the first post-takeoff refresh (round-3
                # 36_hard_weak.sh.out); build_asset_kw is the single
                # builder for exactly this reason
                asset_kw_refresh = build_asset_kw(args)

                def regen_reference(generation: int):
                    ds = SyntheticAssessorDataset(
                        n_ref,
                        output_size=tuple(crop),
                        image_size=tuple(img),
                        seed=args.seed + 1 + 104729 * generation,
                        output_dtype="uint8",
                        crop_pipeline=args.assessor_pipeline,
                        low_iou_fraction=args.assessor_low_iou,
                        **asset_kw_refresh,
                    )
                    c, l = materialize(ds)[:2]
                    return {"real": c, "labels": l}

                refresh = {
                    "reference": (
                        regen_reference,
                        max(args.assessor_refresh // steps_per_call, 1),
                    )
                }
        device_batches = device_chunk_batches(
            mesh, groups, args.batch_size, steps_per_call, seed=args.seed,
            refresh=refresh,
        )
    else:
        loader_kw = dict(
            repeat=True, num_workers=args.num_workers, seed=args.seed
        )
        train_loader = DataLoader(train_ds, args.batch_size, **loader_kw)
        if args.supervised:
            batches = lambda: iter(train_loader)  # (img, bbox, score)
        else:
            ref_loader = DataLoader(ref_ds, args.batch_size, **loader_kw)

            def batches():
                for unlabeled, ref in zip(
                    iter(train_loader), iter(ref_loader)
                ):
                    real, labels = ref[0], ref[1]
                    if isinstance(unlabeled, tuple):
                        unlabeled = unlabeled[0]
                    yield {
                        "real": real,
                        "labels": labels,
                        "unlabeled": unlabeled,
                    }

        device_batches = device_prefetch(
            batches(), lambda b: shard_batch(mesh, b)
        )

    # -- eval --------------------------------------------------------------
    from loans_tpu.data import padded_collate

    eval_batch_size = max(args.batch_size // 2, 1)
    map_eval = MAPEvaluator(
        localizer, img, max_batches=args.eval_batches,
        bn_warmup=args.eval_bn_warmup,
    )
    if use_device_data:
        from loans_tpu.data.device_data import device_eval_batches

        val_batches = device_eval_batches(mesh, val_ds, eval_batch_size)
        if args.eval_batches:
            val_batches = val_batches[: args.eval_batches]

        def eval_fn(trainer, iteration):
            return map_eval(trainer.loc_state, iter(val_batches))
    else:
        val_loader = DataLoader(
            val_ds, eval_batch_size, shuffle=False,
            drop_last=True, num_workers=args.num_workers,
            collate=padded_collate,
        )

        def eval_fn(trainer, iteration):
            return map_eval(trainer.loc_state, iter(val_loader))

    # -- hooks -------------------------------------------------------------
    hooks = []
    if args.plot_interval > 0:
        if args.plot_image:
            from loans_tpu.data import load_image, resize_image

            plot_img = resize_image(
                load_image(args.plot_image), (img.height, img.width)
            ).astype(np.float32) / 255.0
            gt = None
        else:
            plot_img, gt_box = val_ds.get_example(0)[:2]
            gt = np.asarray(gt_box).reshape(-1, 4)
        send_to = None
        if args.send_bboxes:
            host, port = args.send_bboxes.rsplit(":", 1)
            send_to = (host, int(port))
        plotter = BBoxPlotter(
            localizer, assessor, plot_img, log_dir, gt_bbox=gt,
            send_to=send_to,
        )
        hooks.append(
            Hook(plotter, every=args.plot_interval, at_zero=True,
                 name="bbox_plotter")
        )
    if args.profile:
        from loans_tpu.train.profiling import ProfileHook

        hooks.append(
            Hook(
                ProfileHook(log_dir, args.profile[0], args.profile[1]),
                every=1,
                name="profiler",
            )
        )

    # -- iterations --------------------------------------------------------
    iterations = args.iterations
    if args.epochs:
        # steps per epoch from the dataset itself - the device-data path
        # has no host loader
        iterations = args.epochs * (len(train_ds) // args.batch_size)

    step_config = AlternatingConfig(
        localizer_target=args.localizer_target,
        freeze_assessor=bool(args.resume_discriminator)
        and not args.no_freeze,
        image_size=img,
        augment_reference=args.assessor_augment,
        assessor_ema=args.assessor_ema,
        assessor_ema_start=args.assessor_ema_start,
    )
    if args.supervised:
        from loans_tpu.train import (
            make_pooled_train_step,
            make_supervised_train_step,
            supervised_step_body,
        )

        if use_device_data:
            step = make_pooled_train_step(
                supervised_step_body(localizer, step_config),
                steps_per_call,
            )
        else:
            step = make_supervised_train_step(localizer, step_config)
        ass_state = None
    else:
        if use_device_data:
            from loans_tpu.train import (
                alternating_step_body,
                make_pooled_train_step,
            )

            step = make_pooled_train_step(
                alternating_step_body(localizer, assessor, step_config),
                steps_per_call,
            )
        else:
            step = make_train_step(localizer, assessor, step_config)
    lr_schedule = None
    if args.lr_shift:
        from loans_tpu.train import two_state_lr_shifter

        lr_schedule = two_state_lr_shifter(
            args.lr_shift[0], args.lr_shift[1],
            int(args.lr_shift[2]), int(args.lr_shift[3]),
        )
    elif args.lr_decay:
        from loans_tpu.train import multiplicative_lr_decay

        lr_schedule = multiplicative_lr_decay(
            args.lr_decay[0], int(args.lr_decay[1]), args.learning_rate
        )
    trainer = Trainer(
        step,
        replicate(mesh, loc_state),
        None if ass_state is None else replicate(mesh, ass_state),
        device_batches,
        log_dir,
        max_iterations=iterations,
        rng=jax.random.key(args.seed + 17),
        config=config,
        snapshot_interval=args.snapshot_interval,
        log_interval=args.log_interval,
        eval_fn=eval_fn,
        lr_schedule=lr_schedule,
        hooks=hooks,
        control=CommandChannel(log_dir, use_stdin=args.interactive),
        keep_snapshots=args.keep_snapshots,
        steps_per_call=steps_per_call,
    )
    trainer.resume(args.resume_localizer, args.resume_discriminator)
    if args.assessor_ema and trainer.ass_state is not None:
        # ema_params is not persisted in snapshots; re-sync to the
        # restored live params so a resumed run starts from a coherent
        # scoring surface instead of the fresh-init one.
        trainer.ass_state = trainer.ass_state.with_ema()
    if args.dump_graph:
        sds = lambda shape, dt=jnp.float32: jax.ShapeDtypeStruct(shape, dt)
        if args.supervised:
            sample = (
                sds((args.batch_size, img.height, img.width, 3)),
                sds((args.batch_size, 1, 4)),
                sds((args.batch_size, 1)),
            )
        else:
            sample = {
                "real": sds(
                    (args.batch_size, crop.height, crop.width, 3)
                ),
                "labels": sds((args.batch_size, 1)),
                "unlabeled": sds(
                    (args.batch_size, img.height, img.width, 3)
                ),
            }
        rng_sds = jax.eval_shape(lambda: jax.random.key(0))
        if use_device_data:
            # lower the plain per-iteration step (the scanned/pooled
            # variant wraps the same body; the HLO of one iteration is
            # what model.dot documented in the reference)
            if args.supervised:
                from loans_tpu.train import make_supervised_train_step

                plain = make_supervised_train_step(localizer, step_config)
            else:
                plain = make_train_step(localizer, assessor, step_config)
        else:
            plain = step
        lowered = plain.lower(
            trainer.loc_state, trainer.ass_state, sample, rng_sds
        )
        with open(os.path.join(log_dir, "train_step.hlo.txt"), "w") as f:
            f.write(lowered.as_text())
        print(f"wrote {log_dir}/train_step.hlo.txt")
    print(f"training in {log_dir} on {n_dev} device(s)")
    trainer.run()
    print(f"done at iteration {trainer.iteration}; log dir: {log_dir}")
    return log_dir


if __name__ == "__main__":
    main()
