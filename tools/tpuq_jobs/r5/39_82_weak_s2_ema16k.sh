#!/bin/bash
# tpuq-minutes: 40
# Post-takeoff EMA on the default world, seed 2: --assessor-ema-start
# 16000 (no-EMA control job 69 takes off ~12k, 0.4644@24000 rising).
# Pre-registered in RESULTS.md "Post-takeoff EMA": no harm iff
# best@24k >= 0.4444 vs the control; wins iff > 0.4844.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 23000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 24000 \
  --lr-shift 1e-3 1e-4 8000 14000 \
  --assessor-ema 0.99 --assessor-ema-start 16000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runS2_ema16k --log-name runS2_ema16k \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 2
LOG=$(ls -d /tmp/runS2_ema16k/*_runS2_ema16k | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 4 \
  --synthetic-assets 256 --bn-warmup 8
