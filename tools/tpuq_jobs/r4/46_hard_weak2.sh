#!/bin/bash
# VERDICT r3 item 2 (weak arm): r3's hard_weak took off cleanly (IoU 0.40 by
# 8000) then collapsed at exactly the 8000-iteration LR shift — diagnosis:
# assessor-refresh shock coinciding with LR-decay onset. Re-run with the
# shift delayed so takeoff completes before decay. Job 40 showed the hard
# world learns ~3-4x slower than default for the supervised arm, so the
# weak arm gets 26k iters with the shift at 14000/20000.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 25000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 26000 --benchmark hard \
  --lr-shift 1e-3 1e-4 14000 20000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_weak2 --log-name runHard_weak2 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runHard_weak2/*_runHard_weak2 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
