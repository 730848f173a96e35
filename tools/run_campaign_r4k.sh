#!/bin/bash
# Round-4 campaign K: consolidated rerun of the r4e-r4j queue, which never
# executed — the chained watchers (each waiting on the previous campaign's
# DONE marker) were all killed by a container reset right after r4d
# finished, and the reset also wiped datasets/ + experiments/.  Legs are
# reordered by value-per-minute so an early cutoff still lands the most:
#  1. pure fvcg kle512@64 300ep (r4i Q1: does the corrected flux target's
#     pure-fvcg win transfer from channelized to smooth GRF? round-3 fvcg
#     measured 0.830/0.793/0.460 with the UNcorrected target)
#  2. pure fvcg channelized@32 300ep (r4i Q2: the 32^2 wall —
#     reference-objective row R2 .641/.607/.082)
#  3/4. channelized@64 seeds 2,3 (r4i Q3: replicate the headline
#     R2 .996/.998/.984 across seeds)
#  5. pure fvcg kle512@128 300ep, grid-scaled n_cg=128 (r4i Q4 and the
#     VERDICT-r3 item-3 gate: 128^2 u R2 >= 0.95; hybrid sits at 0.930)
#  6. hybrid+flux-anchor kle512@128 with n_cg 256 (r4e leg: deeper CG at
#     kappa~n^2, the other shot at the 0.95 gate)
#  7. pure fvcg channelized@64 1000ep (r4j: both anchors remove the drift
#     direction, so the long schedule should be safe where Sobel was not)
#  8. hybrid kle512@64 1000ep retry of run 62 (r4d leg 3, killed by the
#     axon RPC hang at "Start training"; retry works per round-3)
# Datasets regenerate automatically (ensure_dataset) on each leg's first
# run; all legs use the full canonical sizes so the no-silent-regeneration
# guard never fires.
# Launch:
#   nohup bash tools/run_campaign_r4k.sh > logs/campaign_r4k.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual"

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

bash tools/tpu_gate.sh
timeout 10800 $TRAIN \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics sobel_fvcg --fvcg-flux-weight 1 \
    --fvcg-iters 256 --seed 1 --no-plot --run 72 \
    > logs/hybridflux_kle512_im128_cg256_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 10800 $TRAIN \
    --data channelized --ntrain 4096 --ntest 512 --epochs 1000 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 71 \
    > logs/fvcg2_channelized_1000ep.log 2>&1

bash tools/tpu_gate.sh
timeout 10800 $TRAIN \
    --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 1000 \
    --batch-size 32 --physics sobel_fvcg --fvcg-flux-weight 1 \
    --sobel-size 5 --weight-bound 50 --seed 1 --no-plot --run 70 \
    > logs/hybridflux_kle512_1000ep_retry.log 2>&1

echo CAMPAIGN_R4K_DONE
