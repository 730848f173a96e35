#!/bin/bash
# Campaign O (after N): three RESULTS gaps.
#  1. Nonlinear conv solver at the reference README's exact config
#     (README.md:104: --nonlinear --alpha1 0.1 --alpha2 0.1, kle1024 idx 8)
#     — exercises the FV-Newton oracle end-to-end at full size; no measured
#     accuracy row exists yet.
#  2. FC solver with off-grid LHS collocation (the reference's other
#     collocation mode; only on-grid is documented so far).
#  3. Second cGlow kle512@64 warm-start extension (epochs 400 total seen):
#     does a further +200 ep at lr 1e-4 keep improving flux_v?
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2n.done ]; do sleep 120; done
timeout 1800 python -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
  --data grf --kle 1024 --idx 8 --nonlinear --alpha1 0.1 --alpha2 0.1 \
  > logs/solve_conv_nonlinear_kle1024.log 2>&1
timeout 1800 python -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
  --data grf --kle 512 --idx 8 --off-grid \
  > logs/solve_fc_kle512_offgrid.log 2>&1
src="experiments/cglow/reverse_kld_ext/kle512_ntrain8192_ENC_blocks[3, 3, 3, 3]_FLOW_blocks[4, 4, 4, 4]_wb50.0_beta150.0_batch32_lr0.0002_epochs200"
timeout 10800 python -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
  --beta 150 --ntrain 8192 --ntest 512 --kle 512 --imsize 64 --lr 0.0001 \
  --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --seed 1 \
  --epochs 200 --ckpt-freq 50 --exp-name cglow/reverse_kld_ext2 \
  --init-from "$src:200" > logs/cglow_kle512_im64_ext2.log 2>&1
echo done > logs/campaign_r2o.done
