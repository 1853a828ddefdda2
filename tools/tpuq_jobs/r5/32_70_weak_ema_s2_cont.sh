#!/bin/bash
# tpuq-minutes: 40
# Continue the failed-takeoff runEma_s2 from 24000 to 40000 (-rl/-rd,
# EMA kept on; note the assessor-EMA shadow params are re-seeded from
# the restored assessor at resume — acceptable, the shadow converges to
# the live params within ~500 steps). The 24k sweep was still rising
# steeply (0.051 -> 0.126 -> 0.174 over the last 4k); question is
# whether the run recovers to the 0.8 family given budget, i.e. whether
# the EMA-s2 failure is "slow" or "stuck".
set -e
cd /root/repo
LOG24=$(ls -d /tmp/runEma_s2/*_runEma_s2 | head -1)
test -f "$LOG24/Localizer_24000.msgpack"
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 39000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 40000 \
  -rl "$LOG24/Localizer_24000.msgpack" \
  -rd "$LOG24/ResnetAssessor_24000.msgpack" --no-freeze \
  --lr-shift 1e-3 1e-4 8000 14000 --assessor-ema 0.99 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runEma_s2c --log-name runEma_s2c \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 2
LOG=$(ls -d /tmp/runEma_s2c/*_runEma_s2c | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 4 \
  --synthetic-assets 256 --bn-warmup 8
