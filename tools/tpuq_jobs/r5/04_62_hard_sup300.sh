#!/bin/bash
# tpuq-minutes: 75
# VERDICT r4 item 3: first end-to-end run of the res6 large-input
# mechanism (reference sheep/sheep_localizer.py:51-55 activates res6 for
# inputs > 224), AND a test of the repo's own hypothesis that the hard
# world's <30px bin (acc 0.03) is pixel-starved. Same world/seed/config
# as runHard_sup24k (40b), --target-size 300 300. Ends with the
# size-binned diagnosis on the best snapshot.
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 23000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 24000 --supervised --benchmark hard \
  --target-size 300 300 \
  --lr-shift 1e-3 1e-4 12000 20000 --synthetic-assets 256 \
  --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_sup300 --log-name runHard_sup300 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runHard_sup300/*_runHard_sup300 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
python -u tools/diagnose_eval.py "$LOG" --hard
