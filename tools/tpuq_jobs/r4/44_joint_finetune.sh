#!/bin/bash
# VERDICT r3 item 3b: the last untried parity lever — joint fine-tune
# (-rl/-rd + --no-freeze) from Run D's 14000 snapshots. /tmp was wiped
# between rounds, so phase 1 reproduces Run D (same seed/recipe) to 14000,
# phase 2 resumes jointly to 22000 at decayed LR. r3's attempt was a no-op
# (--iterations is TOTAL; 14000-resume + --iterations 8000 = zero steps).
set -e
cd /root/repo
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 13000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 14000 \
  --lr-shift 1e-3 1e-4 8000 14000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runD2 --log-name runD2 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG1=$(ls -d /tmp/runD2/*_runD2 | head -1)
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 21000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 18 --bf16 --iterations 22000 \
  --resume-localizer "$LOG1/Localizer_14000.msgpack" \
  --resume-discriminator "$LOG1/ResnetAssessor_14000.msgpack" --no-freeze \
  --lr-shift 1e-4 1e-5 18000 21000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runJoint2 --log-name runJoint2 \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG2=$(ls -d /tmp/runJoint2/*_runJoint2 | head -1)
python -u evaluate.py synthetic:512 "$LOG1" -b 64 --seed 3 \
  --synthetic-assets 256 --bn-warmup 8
python -u evaluate.py synthetic:512 "$LOG2" -b 64 --seed 3 \
  --synthetic-assets 256 --bn-warmup 8
