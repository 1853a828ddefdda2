#!/bin/bash
# tpuq-minutes: 70
# VERDICT r4 item 1: the empty fourth cell of the hard 2x2
# (supervision x init):
#   supervised-scratch 0.003 (56)  | supervised-pretrained 0.018 (51)
#   weak-scratch 0.434 (46b/53)    | weak-pretrained      (THIS)
# Reference default = weak + pretrained backbone
# (sheep/sheep_localizer.py:120-178, pretrained_model='auto').
# /tmp/pre was lost to a tmpfs wipe: regenerate via job 47's pretrain
# steps first. Budget-matched to the other two R50-hard arms (14k,
# shift 8000/12000, like jobs 51/56) instead of the original 26k —
# the cell's question is qualitative (collapse vs learn) and both
# R50-hard arms showed their verdict well before 14k.
set -e
cd /root/repo
mkdir -p /tmp/pre
if [ ! -f /tmp/pre/pre.msgpack ]; then
  python -u tools/pretrain_backbone.py --out /tmp/pre/backbone.pth --bf16 \
    --iterations 4000 --seed 0 --asset-seed 9975
  python -u tools/import_resnet50.py /tmp/pre/backbone.pth /tmp/pre/pre.msgpack --verify
fi
python -m loans_tpu.cli.supervise --stall-timeout 1800 --min-iterations 13000 -- \
  python -u train_sheep_localizer.py synthetic:2048 synthetic:32768 synthetic:512 \
  -b 64 --n-layers 50 --bf16 --iterations 14000 --benchmark hard \
  --pretrained-model /tmp/pre/pre.msgpack \
  --lr-shift 1e-3 1e-4 8000 12000 \
  --assessor-refresh 2000 --synthetic-assets 256 --assessor-augment \
  --assessor-low-iou 0.25 --synthetic-cache /tmp/loans_cache \
  --log-dir /tmp/runHard_weak_r50pre --log-name runHard_weak_r50pre \
  --log-interval 500 --snapshot-interval 2000 --eval-batches 8 --seed 1
LOG=$(ls -d /tmp/runHard_weak_r50pre/*_runHard_weak_r50pre | head -1)
python -u evaluate.py synthetic:512 "$LOG" -b 64 --seed 3 \
  --synthetic-assets 256 --benchmark hard --bn-warmup 8
