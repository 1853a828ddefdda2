#!/bin/bash
# VERDICT r3 weak #5: seed 3 of the weak-sup seed matrix was lost to the
# supervise false-success hole (child died 4 min in, rc=0). Re-run with the
# fixed supervisor (--min-iterations).
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 23000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 24000 \
  --lr-shift 1e-3 1e-4 8000 14000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runH_s3 --log-name runH_s3 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 3
LOG=$(ls -d /tmp/runH_s3/*_runH_s3 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 5 \
  --synthetic-assets 256 --bn-warmup 8
