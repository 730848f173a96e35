#!/bin/bash
# Conv-solver experiment: long Adam phase (the codec proves this objective
# trains well under ~40k Adam steps) + zoom L-BFGS polish, 5x5 stencil.
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2e.done ]; do sleep 60; done
python -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
  --data grf --kle 1024 --idx 8 --epochs 100 --linesearch zoom \
  --adam-warmup 20000 --adam-lr 2e-3 --sobel-size 5 \
  --exp-dir ./experiments/solver4 \
  > logs/solve_conv_kle1024_longadam.log 2>&1
echo done > logs/after_e.done
