#!/bin/bash
# Round-4 campaign G (waits for campaign F): CG anchors in the FLOW
# objective (train/glow_trainer.make_reverse_kl_step physics=sobel_fvcg,
# commit 2e7fea0) — does the codec hybrid's label-free win transfer to
# the probabilistic surrogate?
#  1. the reference's headline config, anchored: cGlow kle100@32, 400 ep
#     (plain baseline measured: R2 0.932/0.958/0.903, 41 min,
#     logs/cglow_kle100_im32_400ep.log)
#  2. kle512@64 anchored 200 ep (plain 200ep baseline rel-L2
#     0.0202/0.065/0.259, logs/cglow_kle512_im64_200ep_resume.log)
#  3. full UQ suite on leg-1's run dir (predict-at-x, propagate, dist,
#     reliability) — accuracy AND calibration under the anchor.
# Launch:
#   nohup bash tools/run_campaign_r4g.sh > logs/campaign_r4g.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_cglow_reverse_kl"

while ! grep -q CAMPAIGN_R4F_DONE logs/campaign_r4f.log 2>/dev/null; do
  sleep 120
done

bash tools/tpu_gate.sh
timeout 7200 $TRAIN \
    --kle 100 --imsize 32 --ntrain 4096 --ntest 512 --epochs 400 \
    --beta 150 --physics sobel_fvcg --fvcg-flux-weight 1 \
    --seed 1 --no-plot \
    > logs/cglow_kle100_im32_400ep_fvcg.log 2>&1

bash tools/tpu_gate.sh
timeout 10800 $TRAIN \
    --kle 512 --imsize 64 --ntrain 8192 --ntest 512 --epochs 200 \
    --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --lr 0.001 \
    --beta 150 --physics sobel_fvcg --fvcg-flux-weight 1 \
    --seed 1 --no-plot \
    > logs/cglow_kle512_im64_200ep_fvcg.log 2>&1

RUN=$(ls -d "experiments/cglow/reverse_kld/"kle100_*sobel_fvcg* 2>/dev/null | head -1)
if [ -n "$RUN" ]; then
  bash tools/tpu_gate.sh
  timeout 7200 $PY -m pde_surrogate_tpu.cli.post_cglow --run-dir "$RUN" \
      > logs/post_cglow_kle100_fvcg.log 2>&1
fi

echo CAMPAIGN_R4G_DONE
