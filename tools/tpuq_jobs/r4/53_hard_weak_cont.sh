#!/bin/bash
# Continuation of job 46b (hard_weak3): that run was still climbing at
# its 26k budget (0.4256@26000, monotone since 12k). Resume BOTH nets
# (-rl/-rd --no-freeze keeps the alternating weak-sup dynamic) and run
# 14k more steps at the landed LR to find the converged weak-hard
# number. --iterations is TOTAL (26000 resumed + 14000 extra = 40000).
set -e
cd /root/repo
LOG46B=$(ls -d /tmp/runHard_weak3/*_runHard_weak3 | head -1)
test -f "$LOG46B/Localizer_26000.msgpack"
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 39000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 40000 --benchmark hard \
  -rl "$LOG46B/Localizer_26000.msgpack" \
  -rd "$LOG46B/ResnetAssessor_26000.msgpack" --no-freeze \
  --lr-shift 1e-3 1e-4 14000 20000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_weak4 --log-name runHard_weak4 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runHard_weak4/*_runHard_weak4 | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
