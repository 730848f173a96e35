#!/bin/bash
# Campaign E: spread the winning recipe (5x5 Sobel + weight-bound 50 +
# 600-epoch schedule — logs/canon_kle512_run7_wb50.log) to the families
# where round-2 numbers are still below the kle512 level.
cd /root/repo || exit 1
# wait for the warmup+zoom conv solver run to release the TPU
while kill -0 "$(cat /tmp/sc2.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --data channelized --ntrain 4096 --ntest 512 --epochs 600 --seed 1 \
  --run 2 --sobel-size 5 --weight-bound 50 \
  > logs/canon_channelized_wb50.log 2>&1
python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --kle 100 --imsize 32 --ntrain 4096 --ntest 512 --epochs 600 --seed 1 \
  --run 2 --sobel-size 5 --weight-bound 50 \
  > logs/canon_kle100_im32_wb50.log 2>&1
echo done > logs/campaign_r2e.done
