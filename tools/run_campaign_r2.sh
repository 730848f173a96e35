#!/bin/bash
# Round-2 accuracy campaign: sequential single-TPU runs (one process at a
# time on the chip).  Logs under logs/, experiments under ./experiments.
cd /root/repo || exit 1
D=python
L=logs

# R4: canonical config, 5x5 physics stencil (round-1 probe: better at equal epochs)
$D -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 300 --seed 1 --run 4 --sobel-size 5 \
  > $L/canon_kle512_run4_sobel5.log 2>&1

# R6: channelized family, new init
$D -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --data channelized --ntrain 4096 --ntest 512 --epochs 300 --seed 1 --run 3 \
  > $L/canon_channelized_run3.log 2>&1

# R7: 32x32 KLE family matrix (BASELINE.md)
$D -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --kle 100 --imsize 32 --ntrain 4096 --ntest 512 --epochs 300 --seed 1 \
  > $L/canon_kle100_im32.log 2>&1
$D -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --kle 128 --imsize 32 --ntrain 4096 --ntest 512 --epochs 300 --seed 1 \
  > $L/canon_kle128_im32.log 2>&1

# R8: supervised MLE baseline, new init (RESULTS refresh)
$D -m pde_surrogate_tpu.cli.train_codec_max_likelihood \
  --ntrain 4096 --ntest 512 --epochs 200 --seed 1 --run 2 \
  > $L/mle_kle512_run2.log 2>&1

echo "campaign done" > $L/campaign_r2.done
