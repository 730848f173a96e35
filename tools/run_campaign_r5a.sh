#!/bin/bash
# Round-5 campaign A (adaptive split): leg 1 of the 128^2 root-cause
# matrix only — the supervised MLE ceiling control.  The rest of the
# round-5 queue (canonical cGlow vs further 128^2 gate shots) is decided
# from this result + r4m's 600ep cg256 leg and launched as r5b.
# Launch:
#   nohup bash tools/run_campaign_r5a.sh > logs/campaign_r5a.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
while ! grep -q CAMPAIGN_R4M_DONE logs/campaign_r4m.log 2>/dev/null; do
    sleep 120
done
bash tools/tpu_gate.sh
timeout 3600 python -m pde_surrogate_tpu.cli.train_codec_max_likelihood \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 200 \
    --batch-size 32 --seed 1 --no-plot --run 80 \
    > logs/mle_kle512_im128_200ep.log 2>&1
echo CAMPAIGN_R5A_DONE
