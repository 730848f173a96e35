#!/bin/bash
cd /root/repo || exit 1
# solve_conv with the lr-halving divergence guard
python -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
  --data grf --kle 1024 --idx 8 --epochs 500 \
  > logs/solve_conv_kle1024_guard2.log 2>&1
# stronger boundary pinning: does u stay put while fluxes improve?
python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 600 --seed 1 --run 7 --sobel-size 5 \
  --weight-bound 50 > logs/canon_kle512_run7_wb50.log 2>&1
echo done > logs/campaign_r2d.done
