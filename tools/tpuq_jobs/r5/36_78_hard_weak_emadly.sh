#!/bin/bash
# tpuq-minutes: 45
# Delayed-EMA on the hard world, seed 1 — the decisive rescue test.
# Plain EMA (job 71) lost its bar by -0.147 (0.2783 vs baseline 46b
# 0.4256 @26k) with the s2 early-collapse signature (IoU ~0.003 until
# 10k, takeoff 4k late). Mechanism claim: EMA lag starves early
# localizer/assessor co-calibration; delaying EMA accumulation to the
# first pool swap (--assessor-ema-start 2000) should remove the damage
# while keeping the refresh-shock damping. Pre-registered reads vs the
# SAME baseline 46b (0.4256@26000): delayed EMA RESCUES iff best@26k
# >= 0.40 (within seed noise of baseline); WINS iff > 0.4456 (+0.02).
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 25000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 26000 --benchmark hard \
  --lr-shift 1e-3 1e-4 14000 20000 \
  --assessor-ema 0.99 --assessor-ema-start 2000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_emaD --log-name runHard_emaD \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runHard_emaD/*_runHard_emaD | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
