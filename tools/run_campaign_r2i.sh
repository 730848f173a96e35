#!/bin/bash
# Campaign I (after H): slack-time experiments.
#   1. FC solver with the conv solver's winning 20k-Adam warmup — does the
#      deep-tanh net improve the same way?
#   2. canonical codec wb50 recipe at seeds 2 and 3 — robustness of the
#      headline 0.984/0.988/0.963 result
#   3. cGlow kle100@32 with --coupling wide (reference README.md:70) —
#      first real-config exercise of the wide coupling net
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2h.done ]; do sleep 120; done
timeout 2400 python -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
  --data grf --kle 512 --idx 8 --adam-warmup 20000 \
  --exp-dir ./experiments/solver_fc2 \
  > logs/solve_fc_kle512_warm20k.log 2>&1
timeout 3600 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 600 --seed 2 --run 9 --sobel-size 5 \
  --weight-bound 50 > logs/canon_kle512_run9_wb50_seed2.log 2>&1
timeout 3600 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 600 --seed 3 --run 10 --sobel-size 5 \
  --weight-bound 50 > logs/canon_kle512_run10_wb50_seed3.log 2>&1
timeout 7200 python -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
  --beta 150 --ntrain 4096 --kle 100 --imsize 32 --seed 1 \
  --coupling wide --epochs 400 \
  > logs/cglow_kle100_wide.log 2>&1
echo done > logs/campaign_r2i.done
