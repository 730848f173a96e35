#!/bin/bash
# Round-2 campaign, part B (revised): quick wins first, then long runs.
cd /root/repo || exit 1
D=python
L=logs

# A/B extra seeds (torch comparison bracket), ntrain 512 @ 100 epochs
for S in 2 3; do
  $D -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --ntrain 512 --ntest 512 --epochs 100 --seed $S --run $((S + 10)) \
    > $L/ab_jax_kle512_seed$S.log 2>&1
done

# single-instance solvers, canonical configs (new init)
$D -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
  --data grf --kle 1024 --idx 8 --epochs 500 \
  > $L/solve_conv_kle1024.log 2>&1
$D -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
  --data grf --kle 512 --idx 8 \
  > $L/solve_fc_kle512.log 2>&1

# honest pallas vs xla solver timing
$D tools/pallas_probe.py > $L/pallas_probe.log 2>&1

# cGlow canonical 32x32 (reference README.md:66) — eager loop: the flow's
# scanned epoch measured ~2x slower than per-step dispatch
$D -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
  --beta 150 --ntrain 4096 --kle 100 --imsize 32 --epochs 400 --seed 1 \
  > $L/cglow_kle100_im32.log 2>&1

# post-process it (full UQ suite incl. the scanned propagate)
RUN=$(ls -d experiments/cglow/reverse_kld/kle100_ntrain4096_* | head -1)
$D -m pde_surrogate_tpu.cli.post_cglow --run-dir "$RUN" \
  > $L/post_cglow_kle100.log 2>&1

# solve_conv re-run with the divergence guard (first attempt went NaN)
$D -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
  --data grf --kle 1024 --idx 8 --epochs 500 \
  > $L/solve_conv_kle1024_retry.log 2>&1

# extended-schedule codec (sized to fit the round), 5x5 stencil
$D -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 400 --seed 1 --run 5 --sobel-size 5 \
  > $L/canon_kle512_run5_400ep.log 2>&1

echo done > $L/campaign_r2b.done
