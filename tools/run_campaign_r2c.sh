#!/bin/bash
# Round-2 campaign, part C: the stages lost to the worker-crash wedge.
cd /root/repo || exit 1
D=python
L=logs

# solve_conv canonical re-run with the divergence guard
$D -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
  --data grf --kle 1024 --idx 8 --epochs 500 \
  > $L/solve_conv_kle1024_retry.log 2>&1

# extended-schedule codec, 5x5 stencil
$D -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 600 --seed 1 --run 5 --sobel-size 5 \
  > $L/canon_kle512_run5_600ep.log 2>&1

# fresh honest bench line
$D bench.py > $L/bench_final.log 2>&1

echo done > $L/campaign_r2c.done
