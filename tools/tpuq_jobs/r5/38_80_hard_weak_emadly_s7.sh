#!/bin/bash
# tpuq-minutes: 45
# Hard-world delayed-EMA, seed 7 — second seed for the rescue test
# (job 78 is seed 1). Paired baselines: job 58 hard_weak_s7 no-EMA
# 0.3518@24000 (26k budget) and job 72 plain-EMA s7 (running as this
# is queued). Pre-registered reads vs the no-EMA s7 baseline at the
# same budget: delayed EMA RESCUES iff best@26k >= 0.33 (within seed
# noise of 0.3518); WINS iff > 0.3718 (+0.02).
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 25000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 26000 --benchmark hard \
  --lr-shift 1e-3 1e-4 14000 20000 \
  --assessor-ema 0.99 --assessor-ema-start 2000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_emaD_s7 --log-name runHard_emaD_s7 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 7
LOG=$(ls -d /tmp/runHard_emaD_s7/*_runHard_emaD_s7 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 9 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
