#!/bin/bash
# Same disentangling for the DEFAULT world: job 47's pretrained-R50
# supervised run landed 0.846 vs scratch-R18 supervised 0.911+-0.025.
# Scratch R50 on the identical config separates depth from init there
# too, completing the (world x depth x init) picture.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 18000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 50 --bf16 --iterations 20000 --supervised \
  --lr-shift 1e-3 1e-4 8000 14000 --synthetic-assets 256 \
  --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runSup_r50scratch --log-name runSup_r50scratch \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runSup_r50scratch/*_runSup_r50scratch | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --bn-warmup 8
