#!/bin/bash
# tpuq-minutes: 38
# EMA lever won its pre-registered A/B on both seeds (s3 +0.036,
# s4 +0.035, best 0.9340). Extend to more seeds so the EMA-recipe
# result is a distribution, comparable against supervised
# 0.908±0.023 over {1,2,3,4,7}. This is seed 1 (runH_s1 baseline
# 0.877; Run D same seed 0.897 at its own config).
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 23000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 24000 \
  --lr-shift 1e-3 1e-4 8000 14000 --assessor-ema 0.99 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runEma_s2 --log-name runEma_s2 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 2
LOG=$(ls -d /tmp/runEma_s2/*_runEma_s2 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 4 \
  --synthetic-assets 256 --bn-warmup 8
