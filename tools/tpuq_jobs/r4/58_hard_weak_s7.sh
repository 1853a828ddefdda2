#!/bin/bash
# Second seed for the converged hard-weak recipe (46b config, shift
# 14000/20000, world-consistent refresh) so the 0.434 headline gets a
# spread like every other headline number in RESULTS.md.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 24000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 26000 --benchmark hard \
  --assessor-low-iou 0.25 --assessor-refresh 2000 --assessor-augment \
  --lr-shift 1e-3 1e-4 14000 20000 --synthetic-assets 256 \
  --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_weak_s7 --log-name runHard_weak_s7 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 7
LOG=$(ls -d /tmp/runHard_weak_s7/*_runHard_weak_s7 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 9 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
