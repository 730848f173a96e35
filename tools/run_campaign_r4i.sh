#!/bin/bash
# Round-4 campaign I (waits for campaign H): pure-fvcg sweep.
# Motivation: with the round-4 corrected flux target (Dirichlet-clamped
# CG-corrected pressure fluxes), PURE fvcg hit the channelized
# supervised ceiling label-free (R2 .996/.998/.984 vs MLE .997/.998/.988,
# logs/fvcg2_channelized_300ep.log) — the Sobel flux term was the
# binding constraint on discontinuous K. Questions this campaign answers:
#  1. Does pure fvcg also win on smooth GRF (kle512@64)? Round-3 fvcg
#     measured 0.830/0.793/0.460 there, but with the old (uncorrected)
#     flux target.
#  2. Does it fix the 32^2 channelized wall (reference-objective row:
#     R2 .641/.607/.082)?
#  3. Seed replication of the headline channelized result (seeds 2, 3).
#  4. 128^2 pure fvcg (grid-scaled n_cg=128) vs the r4e hybrid leg.
# Launch:
#   nohup bash tools/run_campaign_r4i.sh > logs/campaign_r4i.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual"

while ! grep -q CAMPAIGN_R4H_DONE logs/campaign_r4h.log 2>/dev/null; do
  sleep 120
done

bash tools/tpu_gate.sh
timeout 5400 $TRAIN \
    --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 65 \
    > logs/fvcg2_kle512_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 5400 $TRAIN \
    --data channelized --imsize 32 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 66 \
    > logs/fvcg2_channelized_im32_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 5400 $TRAIN \
    --data channelized --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 2 --no-plot --run 67 \
    > logs/fvcg2_channelized_300ep_seed2.log 2>&1

bash tools/tpu_gate.sh
timeout 5400 $TRAIN \
    --data channelized --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 3 --no-plot --run 68 \
    > logs/fvcg2_channelized_300ep_seed3.log 2>&1

bash tools/tpu_gate.sh
timeout 10800 $TRAIN \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 69 \
    > logs/fvcg2_kle512_im128_300ep.log 2>&1

echo CAMPAIGN_R4I_DONE
