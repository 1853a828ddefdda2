#!/bin/bash
# tpuq-minutes: 50
# VERDICT r4 item 6: converge hard-weak seed 7. Job 58 ended its 26k
# budget still rising (best 0.3518@24000, same profile 46b had); job 53
# showed continuation to 40k converges the s1 run. Resume BOTH nets at
# 26000 and run to 40000 so the n=2 hard-weak distribution compares
# converged-vs-converged.
set -e
cd /root/repo
LOG58=$(ls -d /tmp/runHard_weak_s7/*_runHard_weak_s7 | head -1)
test -f "$LOG58/Localizer_26000.msgpack"
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 39000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 40000 --benchmark hard \
  -rl "$LOG58/Localizer_26000.msgpack" \
  -rd "$LOG58/ResnetAssessor_26000.msgpack" --no-freeze \
  --lr-shift 1e-3 1e-4 14000 20000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_weak_s7c --log-name runHard_weak_s7c \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 7
LOG=$(ls -d /tmp/runHard_weak_s7c/*_runHard_weak_s7c | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 9 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
