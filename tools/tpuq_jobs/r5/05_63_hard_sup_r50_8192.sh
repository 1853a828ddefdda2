#!/bin/bash
# tpuq-minutes: 90
# VERDICT r4 item 4: test the memorization rule. The R50-hard collapse
# diagnosis (train loss 0.0067 -> 25M params memorize the 2048 hard
# scenes) predicts recovery with a bigger scene pool. Job 56's config
# exactly (scratch R50, hard supervised, 14k) with synthetic:8192 train
# scenes. Recovery toward R18's 0.456@8k-class numbers confirms the
# rule; another collapse kills it.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 13000 -- \
  python -u train_sheep_localizer.py synthetic:8192 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 50 --bf16 --iterations 14000 --supervised --benchmark hard \
  --lr-shift 1e-3 1e-4 8000 12000 --synthetic-assets 256 \
  --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_r50_8192 --log-name runHard_r50_8192 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runHard_r50_8192/*_runHard_r50_8192 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
