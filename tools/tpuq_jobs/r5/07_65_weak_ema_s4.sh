#!/bin/bash
# tpuq-minutes: 50
# Second seed of the assessor-EMA A/B (see 06_64). Baseline: runH_s4
# (same config/seed, best 0.8989@18000).
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 23000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 24000 \
  --lr-shift 1e-3 1e-4 8000 14000 --assessor-ema 0.99 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runEma_s4 --log-name runEma_s4 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 4
LOG=$(ls -d /tmp/runEma_s4/*_runEma_s4 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 6 \
  --synthetic-assets 256 --bn-warmup 8
