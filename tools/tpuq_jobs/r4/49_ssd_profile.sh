#!/bin/bash
# VERDICT r3 item 6: SSD profile treatment past the OOM (SSD512 b64 needs
# 16.36G of 15.75G HBM; cap is 32). Batch sweeps (steady-state only) plus
# one traced profile per model at a safe batch.
cd /root/repo
for b in 16 32 64 128; do
  python -u tools/profile_step.py --model ssd300 $b --no-trace || true
done
for b in 8 16 32; do
  python -u tools/profile_step.py --model ssd512 $b --no-trace || true
done
python -u tools/profile_step.py --model ssd300 64 /tmp/prof_ssd300 || true
python -u tools/profile_step.py --model ssd512 16 /tmp/prof_ssd512 || true
