#!/bin/bash
# Campaign M (after L): canonical-recipe seed robustness at full length.
# Seed 3 landed mid-drift at 600 ep (u R^2 0.61); the canonical claim is
# that the 1000-ep cooldown re-lands u for every seed — test it directly,
# then seed 2 at 1000 ep for a 3-seed headline table.
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2l.done ]; do sleep 120; done
timeout 5400 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 1000 --seed 3 --run 12 --sobel-size 5 \
  --weight-bound 50 > logs/canon_kle512_run12_wb50_1000ep_seed3.log 2>&1
timeout 5400 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 1000 --seed 2 --run 13 --sobel-size 5 \
  --weight-bound 50 > logs/canon_kle512_run13_wb50_1000ep_seed2.log 2>&1
echo done > logs/campaign_r2m.done
