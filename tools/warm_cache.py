"""Pre-populate the --synthetic-cache for a training config without training.

Generating the 32k-crop assessor pool takes 10-15 minutes of host CPU;
with one TPU chip behind the tunnel that is dead device time at the head
of every run. This tool takes the SAME flags as
``train_sheep_localizer.py`` and runs only its dataset-building step
(``loans_tpu/cli/train_localizer.py::build_datasets``), which writes the
disk cache entries keyed identically to a later real run — so cache
warming for seed N+1 can overlap training seed N.

Usage (flags are the train CLI's; only dataset-affecting ones matter):
  python tools/warm_cache.py synthetic:2048 synthetic:32768 synthetic:512 \
      --seed 3 --synthetic-assets 256 --assessor-low-iou 0.25 \
      --crop-size 100 75 --synthetic-cache /tmp/loans_cache
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# dataset generation is pure host work — never claim the TPU for it
_os.environ.setdefault("LOANS_PLATFORM", "cpu")

import time


def main(argv=None):
    from loans_tpu.cli.train_localizer import build_datasets, get_parser

    args = get_parser().parse_args(argv)
    if not args.synthetic_cache:
        raise SystemExit("--synthetic-cache is required (nothing to warm)")
    t0 = time.time()
    train, reference, val = build_datasets(args)
    print(
        f"warmed cache in {time.time() - t0:.0f}s: "
        f"train={len(train)} reference={len(reference)} val={len(val)} "
        f"-> {args.synthetic_cache}"
    )


if __name__ == "__main__":
    main()
