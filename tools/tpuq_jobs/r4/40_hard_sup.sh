#!/bin/bash
# VERDICT r3 item 2: re-run the supervised hard-benchmark arm with the
# world-skew fix (build_asset_kw now routes --benchmark hard kwargs to the
# supervised train split). r3's 0.0008 mAP was train-on-default/eval-on-hard.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 9000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 10000 --supervised --benchmark hard \
  --lr-shift 1e-3 1e-4 5000 9000 --synthetic-assets 256 \
  --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_sup2 --log-name runHard_sup2 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runHard_sup2/*_runHard_sup2 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
