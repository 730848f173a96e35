#!/bin/bash
# Round-4 campaign J (waits for campaign I): reruns + long-schedule fvcg.
#  1. RERUN of r4d leg 3 (run 62): kle512 1000ep sobel5/wb50 hybrid +
#     flux anchor — the original was killed by hang_watchdog at epoch 0
#     (axon RPC hang at "Start training", silent 1099s; the same
#     signature as the round-3 fvcg hang — retry works).
#  2. channelized pure-fvcg 1000 ep: the 300ep run sits 0.004 R^2 under
#     the supervised ceiling; with both CG anchors there is no drift
#     direction, so the long schedule should be safe (unlike Sobel,
#     where channelized never recovers — CLAUDE.md).
# Launch:
#   nohup bash tools/run_campaign_r4j.sh > logs/campaign_r4j.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual"

while ! grep -q CAMPAIGN_R4I_DONE logs/campaign_r4i.log 2>/dev/null; do
  sleep 120
done

bash tools/tpu_gate.sh
timeout 10800 $TRAIN \
    --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 1000 \
    --batch-size 32 --physics sobel_fvcg --fvcg-flux-weight 1 \
    --sobel-size 5 --weight-bound 50 --seed 1 --no-plot --run 70 \
    > logs/hybridflux_kle512_1000ep_retry.log 2>&1

bash tools/tpu_gate.sh
timeout 10800 $TRAIN \
    --data channelized --ntrain 4096 --ntest 512 --epochs 1000 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 71 \
    > logs/fvcg2_channelized_1000ep.log 2>&1

echo CAMPAIGN_R4J_DONE
