#!/bin/bash
# Disentangle job 51's hard-benchmark collapse: 51 changed BOTH depth
# (18->50) and init (scratch->pretrained) vs the 0.489 scratch-R18 arm
# (40b). This arm is scratch R50 on the same hard supervised config;
# if it also collapses, depth/capacity is the cause (memorization of
# the 2048 camouflaged scenes); if it reaches ~0.49, the pretrained
# init is.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 13000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 50 --bf16 --iterations 14000 --supervised --benchmark hard \
  --lr-shift 1e-3 1e-4 8000 12000 --synthetic-assets 256 \
  --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_r50scratch --log-name runHard_r50scratch \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runHard_r50scratch/*_runHard_r50scratch | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
