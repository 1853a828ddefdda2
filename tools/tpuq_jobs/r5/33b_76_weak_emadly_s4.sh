#!/bin/bash
# tpuq-minutes: 40
# Delayed-EMA refinement, seed 4 (the plain-EMA best responder,
# 0.9340@16k vs baseline 0.8989). Checks the delay does not cost the
# win. Pre-registered: keeps the win iff best >= 0.9189
# (baseline + 0.02).
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 23000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 24000 \
  --lr-shift 1e-3 1e-4 8000 14000 \
  --assessor-ema 0.99 --assessor-ema-start 2000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runEmaD_s4 --log-name runEmaD_s4 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 4
LOG=$(ls -d /tmp/runEmaD_s4/*_runEmaD_s4 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 6 \
  --synthetic-assets 256 --bn-warmup 8
