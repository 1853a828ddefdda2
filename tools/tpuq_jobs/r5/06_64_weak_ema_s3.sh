#!/bin/bash
# tpuq-minutes: 50
# VERDICT r4 item 5: ONE pre-registered parity lever. Assessor-EMA
# scoring (--assessor-ema 0.99) damps the refresh-shock scoring jumps
# the hard-weak runs exposed. A/B vs runH_s3 (same config/seed, best
# 0.8424@12000). Decision criterion (pre-registered in RESULTS.md):
# lever wins iff BOTH seeds (s3, s4) beat their same-seed baselines'
# best mAP by > +0.02; dead iff neither; else ambiguous.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 23000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 24000 \
  --lr-shift 1e-3 1e-4 8000 14000 --assessor-ema 0.99 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runEma_s3 --log-name runEma_s3 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 3
LOG=$(ls -d /tmp/runEma_s3/*_runEma_s3 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 5 \
  --synthetic-assets 256 --bn-warmup 8
