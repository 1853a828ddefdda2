#!/bin/bash
# tpuq-minutes: 40
# Continue the seed-2 no-EMA control (job 69, 0.4644@24000 still
# rising) to 40000, mirroring the EMA-s2 continuation (job 70, best
# 0.8585@38000). This completes the honest paired s2 comparison at a
# 40k budget: if the control also reaches ~0.86, EMA's s2 story is
# pure delay with no ceiling effect either way; if the control lands
# materially lower/higher, that difference IS the s2 EMA effect at
# convergence. Baselines: runH_s2 0.832 (shift-18k), EMA-s2 0.8585@38k.
set -e
cd /root/repo
CTL=/tmp/runCtl_s2/2026-08-19_15-14-47_runCtl_s2
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 39000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 40000 \
  -rl "$CTL/Localizer_24000.msgpack" -rd "$CTL/ResnetAssessor_24000.msgpack" \
  --no-freeze --lr-shift 1e-3 1e-4 8000 14000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runCtl_s2c --log-name runCtl_s2c \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 2
LOG=$(ls -d /tmp/runCtl_s2c/*_runCtl_s2c | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 4 \
  --synthetic-assets 256 --bn-warmup 8
