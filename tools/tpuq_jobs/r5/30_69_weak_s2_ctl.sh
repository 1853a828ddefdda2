#!/bin/bash
# tpuq-minutes: 40
# Seed-2 no-EMA control at the standard runH config (shift 8000/14000).
# runEma_s2 failed takeoff (0.17@24k) but runH_s2's 0.832 baseline used
# shift-at-18000 (seed 2 is the known late-takeoff seed), so the collapse
# cannot be attributed to EMA without this control: identical config,
# EMA off. If this also fails takeoff (~0.2), EMA's paired delta at s2
# is ~0 and the failure is the seed's known pre-decay-takeoff problem;
# if this reaches ~0.8, EMA caused the failure.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 23000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 24000 \
  --lr-shift 1e-3 1e-4 8000 14000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runCtl_s2 --log-name runCtl_s2 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 2
LOG=$(ls -d /tmp/runCtl_s2/*_runCtl_s2 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 4 \
  --synthetic-assets 256 --bn-warmup 8
