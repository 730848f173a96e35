#!/bin/bash
# Round-4 campaign B (waits for campaign A): perf probes + follow-ups.
#  1. concat-free dense block A/B (sharedstats_probe now carries cfree
#     rows) — the timeboxed attack on the 23.7% concat/copy trace share.
#  2. scanned cGlow eval-epoch timing (item 7's measured wall delta).
#  3. bench.py preview (the headline must be proven before the round-end
#     driver run, incl. any concat-free flip).
# Launch:
#   nohup bash tools/run_campaign_r4b.sh > logs/campaign_r4b.log 2>&1 &
#   echo $! > /tmp/r4b.pid
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

while ! grep -q CAMPAIGN_R4A_DONE logs/campaign_r4a.log 2>/dev/null; do
  sleep 120
done

# 0. resume the watchdog-killed im128 leg (campaign A leg 4: axon RPC hang
# at epoch 258/300) from its epoch-200 checkpoint — identical args + the
# same run dir, so history + OneCycle position restore exactly.
bash tools/tpu_gate.sh
timeout 7200 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics sobel_fvcg --fvcg-flux-weight 1 \
    --sobel-size 5 --weight-bound 50 --seed 1 --no-plot --run 53 \
    --ckpt-epoch 200 \
    > logs/hybridflux_kle512_im128_300ep_resume.log 2>&1

# 0b. the shared-stats accuracy A-side: no corrected-vintage plain
# canonical (3x3, wb10, 300ep, seed 1, concat impl) exists — the B-side
# (run 54, --shared-stats) measured R2 .957/.953/.857; the default flip
# needs the same-seed A-side on the same vintage.
bash tools/tpu_gate.sh
timeout 5400 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --seed 1 --no-plot --run 56 \
    > logs/canon_kle512_300ep_r4.log 2>&1

bash tools/tpu_gate.sh
timeout 3600 $PY tools/sharedstats_probe.py > logs/cfree_probe_r4.log 2>&1

bash tools/tpu_gate.sh
timeout 3600 $PY tools/glow_eval_probe.py > logs/glow_eval_probe_r4.log 2>&1

bash tools/tpu_gate.sh
timeout 3600 $PY bench.py > logs/bench_r4_preview.json 2> logs/bench_r4_preview.log

echo CAMPAIGN_R4B_DONE
