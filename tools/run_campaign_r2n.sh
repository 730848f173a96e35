#!/bin/bash
# Campaign N (after M): the bilinear-upsample accuracy lever — the one
# round-1 verdict lever never measured. 'bilinear' is a reference codec
# option (UpsamplingBilinear2d, reference models/codec.py:124-136);
# 'nearest' has been the default in every run so far.
#   1. canonical kle512 recipe (1000ep/5x5/wb50) with bilinear — vs run 8
#   2. channelized canonical (300ep/3x3/wb10) with bilinear — smoother
#      upsampling may matter more on the discontinuous family
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2m.done ]; do sleep 120; done
timeout 5400 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 1000 --seed 1 --run 14 --sobel-size 5 \
  --weight-bound 50 --upsample bilinear \
  > logs/canon_kle512_run14_wb50_1000ep_bilinear.log 2>&1
timeout 3600 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --data channelized --ntrain 4096 --ntest 512 --epochs 300 --seed 1 \
  --run 4 --upsample bilinear \
  > logs/canon_channelized_run4_bilinear.log 2>&1
echo done > logs/campaign_r2n.done
