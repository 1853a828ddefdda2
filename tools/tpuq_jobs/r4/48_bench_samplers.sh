#!/bin/bash
# VERDICT r3 item 5: re-measure the sampler table with the rewritten
# host-readback-timed harness (r3's scan timings were tunnel artifacts),
# including the end-to-end --step mode, at rotation ratio 0.5 — the round-2
# "rotated-dense-with-analytic-VJP vs general-gather" question.
set -e
cd /root/repo
python -u tools/bench_samplers.py --batch 64 --rotation-ratio 0.5 --step
