#!/bin/bash
# 5th supervised seed (7) so the parity comparison is 5-vs-5 seeds over
# the identical seed set {1,2,3,4,7} as the weak-supervised arm.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 18000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 20000 --supervised \
  --lr-shift 1e-3 1e-4 8000 14000 --synthetic-assets 256 \
  --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runSup_s7 --log-name runSup_s7 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 7
LOG=$(ls -d /tmp/runSup_s7/*_runSup_s7 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 9 \
  --synthetic-assets 256 --bn-warmup 8
