#!/bin/bash
# Round-3 campaign A: regenerate datasets lost to the container reset and
# re-run the measurement logs docs/RESULTS.md cites (VERDICT items 3/5/6).
# Sequential: ONE TPU process at a time.  All drivers are scan-epoch
# (CPU-starvation immune).  Launch:
#   nohup bash tools/run_campaign_r3a.sh > logs/campaign_r3a.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

# --- datasets ----------------------------------------------------------
# The channelized train file holds only the A/B's 512 unlabeled samples;
# the generator is prefix-stable (seeded sequential draws), so the full
# 4096-sample labeled regeneration reproduces those 512 inputs exactly.
rm -f datasets/64x64/channel_ng64_n4096_train.hdf5
timeout 5400 $PY -m pde_surrogate_tpu.cli.make_dataset --family channelized \
    --imsize 64 --ntrain 4096 --ntest 512 --train-labels \
    > logs/gen_channelized.log 2>&1

timeout 10800 $PY -m pde_surrogate_tpu.cli.make_dataset --family grf \
    --kle 512 --imsize 64 --ntrain 10000 --nval 1000 --ntest 1000 \
    --n-monte-carlo 10000 --train-labels \
    > logs/gen_kle512.log 2>&1

# --- supervised ceilings (VERDICT item 6 + lost mle_kle512 log) --------
timeout 3600 $PY -m pde_surrogate_tpu.cli.train_codec_max_likelihood \
    --data channelized --ntrain 4096 --ntest 512 --epochs 200 \
    --batch-size 32 --seed 1 --no-plot --run 1 \
    > logs/mle_channelized_run1.log 2>&1

timeout 3600 $PY -m pde_surrogate_tpu.cli.train_codec_max_likelihood \
    --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 200 \
    --batch-size 32 --seed 1 --no-plot --run 2 \
    > logs/mle_kle512_run2.log 2>&1

# --- canonical label-free headline (lost canon log) --------------------
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 1000 \
    --batch-size 32 --sobel-size 5 --weight-bound 50 --seed 1 --no-plot \
    --run 8 > logs/canon_kle512_run8_wb50_1000ep.log 2>&1

# --- solver rows (lost logs + VERDICT item 5 nonlinear row) ------------
timeout 3600 $PY -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
    --data grf --kle 1024 --idx 8 --sobel-size 5 --no-plot \
    > logs/solve_conv_kle1024_longadam.log 2>&1

# nonlinear: reference config alpha1=alpha2=1 vs the FV-Newton oracle
timeout 3600 $PY -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
    --data grf --kle 1024 --idx 8 --nonlinear --alpha1 1 --alpha2 1 \
    --sobel-size 5 --no-plot \
    > logs/solve_conv_nonlinear_kle1024.log 2>&1

timeout 3600 $PY -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
    --data grf --kle 512 --idx 8 --no-plot \
    > logs/solve_fc_kle512_warm4k.log 2>&1

# negative-result rerun: 20k warmup collapses the tanh MLP
timeout 3600 $PY -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
    --data grf --kle 512 --idx 8 --adam-warmup 20000 --no-plot \
    > logs/solve_fc_kle512_warm20k.log 2>&1

# --- A/B JAX seed legs (lost ab_jax_kle512_seed* logs) ------------------
for seed in 2 3; do
  timeout 3600 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
      --data grf_kle512 --ntrain 512 --ntest 512 --epochs 100 \
      --batch-size 32 --seed $seed --no-plot --run 10$seed \
      > logs/ab_jax_kle512_seed$seed.log 2>&1
done

echo CAMPAIGN_R3A_DONE
