#!/bin/bash
# Follow-up to 40: the world-skew fix works (supervised-hard learns:
# 0.44@10000 in-train vs r3's 0.0008 collapse) but 10k iters is too short —
# the hard world learns ~3-4x slower than default (default-world supervised
# was 0.72 by 4000, hard 0.16). Give it the full default-run treatment:
# 24k iters, shift delayed to 12000/20000.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 23000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 24000 --supervised --benchmark hard \
  --lr-shift 1e-3 1e-4 12000 20000 --synthetic-assets 256 \
  --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_sup24k --log-name runHard_sup24k \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runHard_sup24k/*_runHard_sup24k | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
