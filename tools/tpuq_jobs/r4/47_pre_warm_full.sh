#!/bin/bash
# VERDICT r3 item 3a: a completed training run from a *trained* backbone —
# the reference's default workflow (sheep_localizer.py:128 pretrained_model=
# 'auto'). Pretrain a ResNet-50 classifier on procedural scenes, export in
# torchvision layout, import through the real path, fine-tune 20k supervised.
# (r3's 5k warm-vs-scratch curves are committed; this is the full run.)
set -e
cd /root/repo
mkdir -p /tmp/pre
python -u tools/pretrain_backbone.py --out /tmp/pre/backbone.pth --bf16 \
  --iterations 4000 --seed 0 --asset-seed 9975
python -u tools/import_resnet50.py /tmp/pre/backbone.pth /tmp/pre/pre.msgpack --verify
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 19000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 50 --bf16 --iterations 20000 --supervised \
  --pretrained-model /tmp/pre/pre.msgpack \
  --lr-shift 1e-3 1e-4 8000 14000 --synthetic-assets 256 \
  --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runPre_full --log-name runPre_full \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 2
LOG=$(ls -d /tmp/runPre_full/*_runPre_full | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 4 \
  --synthetic-assets 256 --bn-warmup 8
