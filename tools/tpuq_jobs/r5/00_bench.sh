#!/bin/bash
# tpuq-minutes: 15
# VERDICT r4 item 2: re-establish the bench number on a guaranteed-idle
# chip (BENCH_r04 2037 was contaminated by queue job 58 running in the
# driver's measurement window; r02/r03 agreed at 2242/2241).
set -e
cd /root/repo
python -u bench.py | tee /tmp/tpuq/bench_r5_idle.json
