#!/bin/bash
# Round-4 campaign D (waits for campaign C): close the channelized flux_v
# gap + upgrade the canonical recipes with the flux anchor.
#  1. channelized hybrid fw1 + DEEPER CG (--fvcg-iters 256): at contrast
#     100, sqrt(kappa) ~ 640 — n_cg=64 leaves e_k (and the flux target)
#     under-converged; fw1@64 measured flux_v R^2 0.70 vs target 0.80.
#  2. channelized PURE fvcg (round-4 corrected flux target): no Sobel flux
#     term to fight the anchor on the discontinuities.
#  3. kle512 best-canonical upgrade: sobel5 + wb50 + flux anchor, 1000 ep
#     (round-3 best was 0.983/0.992/0.975 without the anchor; the anchor
#     removes the u-drift lottery that forced the 300-ep recommendation).
# Launch:
#   nohup bash tools/run_campaign_r4d.sh > logs/campaign_r4d.log 2>&1 &
#   echo $! > /tmp/r4d.pid
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual"

while ! grep -q CAMPAIGN_R4C_DONE logs/campaign_r4c.log 2>/dev/null; do
  sleep 120
done

bash tools/tpu_gate.sh
timeout 5400 $TRAIN \
    --data channelized --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics sobel_fvcg --fvcg-flux-weight 1 \
    --fvcg-iters 256 --seed 1 --no-plot --run 60 \
    > logs/hybridflux_channelized_fw1_cg256_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 5400 $TRAIN \
    --data channelized --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 61 \
    > logs/fvcg2_channelized_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 10800 $TRAIN \
    --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 1000 \
    --batch-size 32 --physics sobel_fvcg --fvcg-flux-weight 1 \
    --sobel-size 5 --weight-bound 50 --seed 1 --no-plot --run 62 \
    > logs/hybridflux_kle512_1000ep.log 2>&1

echo CAMPAIGN_R4D_DONE
