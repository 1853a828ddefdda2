#!/bin/bash
# Hard benchmark x pretrained workflow: does the reference's default
# (pretrained ResNet-50, sheep_localizer.py:120-178) lift the hard
# world the way ImageNet weights lift real photos? Uses job 47's
# exported backbone (/tmp/pre/pre.msgpack). Supervised arm, 14k iters.
set -e
cd /root/repo
test -f /tmp/pre/pre.msgpack
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 13000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 50 --bf16 --iterations 14000 --supervised --benchmark hard \
  --pretrained-model /tmp/pre/pre.msgpack \
  --lr-shift 1e-3 1e-4 8000 12000 --synthetic-assets 256 \
  --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_r50pre --log-name runHard_r50pre \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runHard_r50pre/*_runHard_r50pre | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
