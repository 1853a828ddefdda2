#!/bin/bash
# The reference's TRUE default configuration, never yet run end-to-end:
# weakly-supervised training with a pretrained ResNet-50 localizer
# (sheep_localizer.py:120-178 Resnet50SheepLocalizer,
# pretrained_model='auto' — the paper's headline workflow is weak sup
# FROM pretrained features). Uses job 47's exported backbone. Run D
# recipe otherwise; 20k iters.
set -e
cd /root/repo
test -f /tmp/pre/pre.msgpack
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 19000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 50 --bf16 --iterations 20000 \
  --pretrained-model /tmp/pre/pre.msgpack \
  --lr-shift 1e-3 1e-4 8000 14000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runWeak_r50pre --log-name runWeak_r50pre \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runWeak_r50pre/*_runWeak_r50pre | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --bn-warmup 8
