#!/bin/bash
# Campaign U (after R; inserted ahead of the rechained T and S): the cheap
# coverage legs first —
#   1. FC/PINN solver on warped GRF idx 8   (BASELINE family matrix)
#   2. FC/PINN solver on channelized idx 8  (BASELINE family matrix)
#   3. canonical kle512@64 codec run with --dtype bf16: does the 1.3x
#      faster conv dtype hold label-free accuracy at 300 epochs?
#   4. 128x128 label-free codec probe (beyond-reference resolution;
#      label solves now scale n_iter with the grid, solvers/fd_darcy.py)
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2r.done ]; do sleep 120; done
for attempt in 1 2; do
  timeout 1800 python -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
    --data warped_grf --idx 8 > logs/solve_fc_warped.log 2>&1 && break
  sleep 60
done
for attempt in 1 2; do
  timeout 1800 python -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
    --data channelized --idx 8 > logs/solve_fc_channelized.log 2>&1 && break
  sleep 60
done
for attempt in 1 2; do
  timeout 3600 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --ntrain 4096 --ntest 512 --epochs 300 --seed 1 --run 20 --dtype bf16 \
    > logs/canon_kle512_run20_bf16.log 2>&1 && break
  sleep 60
done
for attempt in 1 2; do
  timeout 7200 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 --seed 1 --run 21 \
    > logs/canon_kle512_run21_im128.log 2>&1 && break
  sleep 60
done
echo done > logs/campaign_r2u.done
