#!/bin/bash
# Round-4 campaign F (waits for campaign E): clean perf re-probes.
#  1. sharedstats/cfree probe re-run: the r4b probe (a) crashed on the
#     concat-free bf16 VJP bug (fixed: models/codec._conv3x3_f32acc
#     custom_vjp) before the bf16 cfree row, and (b) overlapped a pytest
#     run on this 1-core host, so its eager-dispatch timings are
#     contended (shared f32 gain read +0.7% vs round 3's +7.3%).
#  2. bench.py preview re-run: the r4b preview (3850 s/s headline, below
#     the concat row) was CPU-starved for the same reason.
# NOTHING CPU-HEAVY may run while these probes time.
# Launch:
#   nohup bash tools/run_campaign_r4f.sh > logs/campaign_r4f.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

while ! grep -q CAMPAIGN_R4E_DONE logs/campaign_r4e.log 2>/dev/null; do
  sleep 120
done

bash tools/tpu_gate.sh
timeout 3600 $PY tools/sharedstats_probe.py > logs/cfree_probe_r4f.log 2>&1

bash tools/tpu_gate.sh
timeout 3600 $PY bench.py > logs/bench_r4f_preview.json \
    2> logs/bench_r4f_preview.log

echo CAMPAIGN_R4F_DONE
