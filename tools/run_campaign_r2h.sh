#!/bin/bash
# Campaign H (after G): attribution + extended schedules.
#   0. conv-solver attribution: warmup+zoom with the 3x3 stencil — did the
#      win come from the warmup (optimizer) or the 5x5 stencil (objective)?
#   1. codec kle512 wb50+5x5 at 1000 epochs (600-ep run was still improving)
#   2. resume the big cGlow from epoch 200 to the reference's 400
#      (run dirs are named by --epochs, mirroring the reference, so the
#      checkpoints are copied into the epochs400 dir before --resume)
#   3. post_cglow on the 400-epoch model; final bench
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2g.done ]; do sleep 120; done
timeout 2400 python -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
  --data grf --kle 1024 --idx 8 --epochs 100 \
  --exp-dir ./experiments/solver5 \
  > logs/solve_conv_kle1024_longadam_3x3.log 2>&1
# BASELINE.md family matrix: warped-GRF and channelized single-instance
# rows (reference solve_conv supports both families)
timeout 2400 python -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
  --data warped_grf --idx 8 --epochs 100 --sobel-size 5 \
  --exp-dir ./experiments/solver6 \
  > logs/solve_conv_warped.log 2>&1
timeout 2400 python -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
  --data channelized --idx 8 --epochs 100 --sobel-size 5 \
  --exp-dir ./experiments/solver7 \
  > logs/solve_conv_channelized.log 2>&1
timeout 3600 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 1000 --seed 1 --run 8 --sobel-size 5 \
  --weight-bound 50 > logs/canon_kle512_run8_wb50_1000ep.log 2>&1
src=$(ls -dt experiments/cglow/reverse_kld/*kle512*ntrain8192*epochs200* 2>/dev/null | head -1)
if [ -n "$src" ] && [ -d "$src/checkpoints" ]; then
  dst="${src/epochs200/epochs400}"
  mkdir -p "$dst/checkpoints"
  cp -n "$src"/checkpoints/* "$dst/checkpoints/" 2>/dev/null
  timeout 14400 python -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
    --beta 150 --ntrain 8192 --ntest 512 --kle 512 --imsize 64 --lr 0.001 \
    --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --seed 1 \
    --epochs 400 --ckpt-freq 50 --resume \
    > logs/cglow_kle512_im64_resume400.log 2>&1
  timeout 3600 python -m pde_surrogate_tpu.cli.post_cglow \
    --run-dir "$dst" > logs/post_cglow_kle512_400.log 2>&1
fi
python bench.py > logs/bench_postH.log 2>&1
echo done > logs/campaign_r2h.done
