#!/bin/bash
# tpuq-minutes: 50
# Assessor-EMA on the reference's TRUE default configuration (weak sup
# from a pretrained ResNet-50, sheep_localizer.py:120-178) — paired
# baseline job 52 runWeak_r50pre 0.848@12000 (20k budget, seed 1).
# If EMA lifts the reference-default workflow too, the lever verdict
# generalizes beyond scratch R18. Read: helps iff best > 0.868.
set -e
cd /root/repo
test -f /tmp/pre/pre.msgpack
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 19000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 50 --bf16 --iterations 20000 \
  --pretrained-model /tmp/pre/pre.msgpack \
  --lr-shift 1e-3 1e-4 8000 14000 --assessor-ema 0.99 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runWeak_r50pre_ema --log-name runWeak_r50pre_ema \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runWeak_r50pre_ema/*_runWeak_r50pre_ema | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --bn-warmup 8
