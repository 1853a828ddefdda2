#!/bin/bash
# tpuq-minutes: 45
# Post-takeoff EMA on the hard world, seed 1: --assessor-ema-start
# 16000 (baseline 46b takes off ~12k). Pre-registered in RESULTS.md
# "Post-takeoff EMA": no harm iff best@26k >= 0.40 vs 46b 0.4256;
# wins iff > 0.4456. A collapse after the 16k switch-on would falsify
# the takeoff-gated mechanism.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 25000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 26000 --benchmark hard \
  --lr-shift 1e-3 1e-4 14000 20000 \
  --assessor-ema 0.99 --assessor-ema-start 16000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_ema16k --log-name runHard_ema16k \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runHard_ema16k/*_runHard_ema16k | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
