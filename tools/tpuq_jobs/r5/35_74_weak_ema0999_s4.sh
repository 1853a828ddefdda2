#!/bin/bash
# tpuq-minutes: 40
# EMA-coefficient sensitivity on the best-responding seed: s4 with
# --assessor-ema 0.999 (~1000-step memory) vs 0.99's 0.9340 and the
# no-EMA baseline 0.8989. If 0.999 over-smooths (assessor shadow lags
# the refresh cadence of 2000 steps), expect a takeoff delay like s2;
# if it wins further, the smoothing direction is not yet saturated.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 23000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 24000 \
  --lr-shift 1e-3 1e-4 8000 14000 --assessor-ema 0.999 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runEma999_s4 --log-name runEma999_s4 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 4
LOG=$(ls -d /tmp/runEma999_s4/*_runEma999_s4 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 6 \
  --synthetic-assets 256 --bn-warmup 8
