#!/bin/bash
# tpuq-minutes: 45
# VERDICT r4 items 1/5: second SUPERVISED-hard seed (40b config, seed 7)
# so the hard-world table has n>=2 per arm and the weak/supervised
# relative number is a distribution, not single seeds.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 23000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 24000 --supervised --benchmark hard \
  --lr-shift 1e-3 1e-4 12000 20000 --synthetic-assets 256 \
  --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_sup_s7 --log-name runHard_sup_s7 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 7
LOG=$(ls -d /tmp/runHard_sup_s7/*_runHard_sup_s7 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 9 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
