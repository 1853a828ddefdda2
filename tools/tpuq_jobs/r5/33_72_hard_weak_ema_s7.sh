#!/bin/bash
# tpuq-minutes: 45
# Second seed for hard-world EMA (paired baseline: job 58 hard_weak_s7
# best 0.3518@24000 at the same 26k budget / converged 0.3723@32000
# after continuation). Same pre-stated read as seed 1: EMA helps iff
# best@26k > baseline@26k + 0.02 (i.e. > 0.3718).
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 25000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 26000 --benchmark hard \
  --lr-shift 1e-3 1e-4 14000 20000 --assessor-ema 0.99 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_ema_s7 --log-name runHard_ema_s7 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 7
LOG=$(ls -d /tmp/runHard_ema_s7/*_runHard_ema_s7 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 9 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
