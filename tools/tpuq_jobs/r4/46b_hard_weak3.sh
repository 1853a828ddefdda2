#!/bin/bash
# A/B against job 46: identical config, but with the refresh world-skew
# FIX (commit 227a052) — job 46 ran with assessor-refresh pools drawn
# from the DEFAULT world (hard kwargs dropped); this run's refresh pools
# come from the hard world like every other split. Comparison isolates
# how much of weak-hard's deficit was the skewed refresh signal.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 25000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 26000 --benchmark hard \
  --lr-shift 1e-3 1e-4 14000 20000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_weak3 --log-name runHard_weak3 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runHard_weak3/*_runHard_weak3 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
