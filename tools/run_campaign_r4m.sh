#!/bin/bash
# Round-4 campaign M: the 128^2 u-gate (VERDICT-r3 item 3: u R^2 >= 0.95)
# and the channelized@128 matrix cell.  Context: pure fvcg at kle512@128
# with the default grid-scaled CG depth (n_cg = n = 128) landed R^2
# 0.873 / 0.937 / 0.939 (logs/fvcg2_kle512_im128_300ep.log) — fluxes beat
# the hybrid's 128^2 row (0.866/0.853) but u trails it (0.930) and the
# gate.  kappa(A) ~ n^2 * contrast, CG error decays like O(sqrt(kappa)),
# so depth-proportional-to-n halves the *relative* resolution each size
# doubling; r4k leg 6 (run 72) tests cg256 for the hybrid, these legs
# test it for pure fvcg plus the schedule lever (drift-free by
# construction, so long schedules are safe where Sobel was not).
# Legs (value-ordered; the cg256 300ep gate shot moved to the FRONT of
# campaign r4l after the anchor-resolution probe confirmed its headroom):
#  1. pure fvcg channelized@128, 300ep — a (family,size) cell the
#     reference never ships (its drivers stop at 64^2); sampler is
#     size-parameterized (data/grf.sample_channelized)
#  2. pure fvcg kle512@128, cg256, 600ep — schedule x depth combined
# Waits for campaign r4l's DONE marker (single-process TPU).
# Launch:
#   nohup bash tools/run_campaign_r4m.sh > logs/campaign_r4m.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual"

while ! grep -q CAMPAIGN_R4L_DONE logs/campaign_r4l.log 2>/dev/null; do
    sleep 120
done

bash tools/tpu_gate.sh
timeout 10800 $TRAIN \
    --data channelized --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 74 \
    > logs/fvcg2_channelized_im128_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 14400 $TRAIN \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 600 \
    --batch-size 32 --physics fvcg --fvcg-iters 256 --seed 1 --no-plot \
    --run 75 \
    > logs/fvcg2_kle512_im128_cg256_600ep.log 2>&1

echo CAMPAIGN_R4M_DONE
