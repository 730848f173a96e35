#!/bin/bash
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2d.done ]; do sleep 60; done
python -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
  --data grf --kle 1024 --idx 8 --epochs 500 --exp-dir ./experiments/solver2 \
  > logs/solve_conv_kle1024_fixed.log 2>&1
echo done > logs/after_d.done
