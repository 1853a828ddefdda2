#!/bin/bash
# tpuq-minutes: 45
# Assessor-EMA on the hard world, seed 1 — testing the lever where its
# mechanism was discovered: the refresh-shock collapse (job 46) happened
# on hard, and the EMA hypothesis is that a smoothed scoring surface
# damps exactly those pool-swap jumps. Baseline: 46b hard_weak3
# (identical config, no EMA) best 0.4256@26000 / converged 0.434@34000.
# Pre-stated read: EMA helps on hard iff best@26k > 0.4456 (+0.02).
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 25000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 26000 --benchmark hard \
  --lr-shift 1e-3 1e-4 14000 20000 --assessor-ema 0.99 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_ema --log-name runHard_ema \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runHard_ema/*_runHard_ema | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
