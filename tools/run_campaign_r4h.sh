#!/bin/bash
# Round-4 campaign H (waits for campaign G): BASELINE fill-ins.
#  1. solve_fc kle512 idx 8 — the one BASELINE.md:34 canonical config
#     with no corrected-vintage measured row (FC keeps the 4k Adam
#     default: the 20k warmup collapses the tanh MLP to the constant
#     basin, round-2 negative result).
#  2. channelized@32 hybrid + flux anchor — the @32 matrix row measured
#     the reference objective's wall at its worst (R2 .641/.607/.082);
#     this leg measures how much the round-4 anchors recover at 32^2
#     (64^2 anchored: .987/.980/.861).
# Launch:
#   nohup bash tools/run_campaign_r4h.sh > logs/campaign_r4h.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

while ! grep -q CAMPAIGN_R4G_DONE logs/campaign_r4g.log 2>/dev/null; do
  sleep 120
done

bash tools/tpu_gate.sh
timeout 3600 $PY -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
    --data grf --kle 512 --idx 8 --no-plot \
    > logs/solve_fc_kle512_r4.log 2>&1

bash tools/tpu_gate.sh
timeout 5400 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data channelized --imsize 32 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics sobel_fvcg --fvcg-flux-weight 4 \
    --seed 1 --no-plot --run 64 \
    > logs/hybridflux_channelized_im32_300ep.log 2>&1

echo CAMPAIGN_R4H_DONE
