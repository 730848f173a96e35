#!/bin/bash
# Campaign I (after H): slack-time experiments, highest value first.
#   1. FC solver with the conv solver's winning 20k-Adam warmup
#   2. canonical codec wb50 recipe at seeds 2 and 3 (headline robustness)
#   3. kle512 cGlow extension: warm-start from the 200-epoch model with a
#      fresh low-lr schedule (--init-from; the safe OneCycle extension)
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
src=$(ls -dt experiments/cglow/reverse_kld/*kle512*ntrain8192*epochs200* 2>/dev/null | head -1)
if [ -n "$src" ]; then
  timeout 10800 python -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
    --beta 150 --ntrain 8192 --ntest 512 --kle 512 --imsize 64 --lr 0.0002 \
    --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --seed 1 \
    --epochs 200 --ckpt-freq 50 --exp-name cglow/reverse_kld_ext \
    --init-from "$src:200" \
    > logs/cglow_kle512_im64_ext.log 2>&1
fi
echo done > logs/campaign_r2i.done
