#!/bin/bash
# Round-4 campaign E (waits for campaign D): the last 128^2 push.
# The grid-scaled hybrid+flux-anchor 128^2 row landed at u R^2 0.930
# (target 0.95); consistency plateaus ~0.10 (vs 0.05-0.07 at 64^2),
# pointing at the anchor's own resolution — e_k at n_cg=n is an
# estimate, not a solve, and kappa(A) grew 4x. One leg: double the CG
# depth (--fvcg-iters 256 = 2n) at the otherwise-identical recipe.
# Launch:
#   nohup bash tools/run_campaign_r4e.sh > logs/campaign_r4e.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual"

while ! grep -q CAMPAIGN_R4D_DONE logs/campaign_r4d.log 2>/dev/null; do
  sleep 120
done

bash tools/tpu_gate.sh
timeout 10800 $TRAIN \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics sobel_fvcg --fvcg-flux-weight 1 \
    --fvcg-iters 256 --sobel-size 5 --weight-bound 50 --seed 1 --no-plot \
    --run 63 \
    > logs/hybridflux_kle512_im128_cg256_300ep.log 2>&1

echo CAMPAIGN_R4E_DONE
