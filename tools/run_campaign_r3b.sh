#!/bin/bash
# Round-3 campaign B: (1) the exactly-identifiable FV label-free objective
# (--physics fv) on channelized + canonical kle512, (2) the r3a legs lost
# when the session restarted mid-campaign (solve_fc, ab_jax seeds), (3) the
# honest-fence glow scan probe (VERDICT item 2).
# Sequential: ONE TPU process at a time.  All drivers are scan-epoch
# (CPU-starvation immune).  Launch:
#   nohup bash tools/run_campaign_r3b.sh > logs/campaign_r3b.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

bash tools/tpu_gate.sh

# --- FV objective: the round-3 label-free headline ---------------------
# Channelized: Sobel label-free is walled at R2 0.77/0.78/0.46 while the
# supervised ceiling is 0.997/0.998/0.988 (logs/mle_channelized_run1.log).
# The FV residual has loss=0 iff truth, so it should close most of the gap.
timeout 5400 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data channelized --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fv --seed 1 --no-plot --run 20 \
    > logs/fv_channelized_300ep.log 2>&1

bash tools/tpu_gate.sh
# Canonical kle512, same schedule as the 300-ep sobel recipe
timeout 5400 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fv --seed 1 --no-plot --run 21 \
    > logs/fv_kle512_300ep.log 2>&1

bash tools/tpu_gate.sh
# FV long schedule: exact identifiability should remove the u-drift lottery
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 1000 \
    --batch-size 32 --physics fv --seed 1 --no-plot --run 22 \
    > logs/fv_kle512_1000ep.log 2>&1

# --- r3a legs lost to the session restart ------------------------------
bash tools/tpu_gate.sh
timeout 3600 $PY -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
    --data grf --kle 512 --idx 8 --no-plot \
    > logs/solve_fc_kle512_warm4k.log 2>&1

bash tools/tpu_gate.sh
timeout 3600 $PY -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
    --data grf --kle 512 --idx 8 --adam-warmup 20000 --no-plot \
    > logs/solve_fc_kle512_warm20k.log 2>&1

for seed in 2 3; do
  bash tools/tpu_gate.sh
  timeout 3600 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
      --data grf_kle512 --ntrain 512 --ntest 512 --epochs 100 \
      --batch-size 32 --seed $seed --no-plot --run 10$seed \
      > logs/ab_jax_kle512_seed$seed.log 2>&1
done

# --- glow scan anomaly, honest fences (VERDICT item 2) -----------------
bash tools/tpu_gate.sh
timeout 3600 $PY tools/glow_scan_probe.py \
    > logs/glow_scan_probe_r3.log 2>&1

echo CAMPAIGN_R3B_DONE
