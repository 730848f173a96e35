#!/bin/bash
# Round-3 campaign G (waits for campaign F's marker): consolidation legs.
#  1. bench.py preview — the shared-stats headline edit must be proven on
#     hardware BEFORE the driver's round-end bench run.
#  2/3. hybrid kle512@64 seeds 2+3 — the sobel_fvcg claim is that the CG
#     anchor removes the u-drift lottery BY CONSTRUCTION; two more seeds
#     either replicate that or kill the claim (8 min each).
#  4. hybrid channelized + 5x5 sobel — canonical@64 learning: the 5-tap
#     stencil materially helps flux_v; channelized flux_v (R^2 0.45) is the
#     weakest remaining cell.
#  5. tuned 128: hybrid + sobel5 + wb50 (the canonical@64 recipe mapped up).
# Launch:
#   nohup bash tools/run_campaign_r3g.sh > logs/campaign_r3g.log 2>&1 &
#   echo $! > /tmp/r3g.pid
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

while ! grep -q CAMPAIGN_R3F_DONE logs/campaign_r3f.log 2>/dev/null; do
  sleep 120
done

# --- 1. bench preview ------------------------------------------------------
bash tools/tpu_gate.sh
timeout 3600 $PY bench.py > logs/bench_r3_preview.json 2> logs/bench_r3_preview.log

# --- 2/3. hybrid seed replication -----------------------------------------
for SEED in 2 3; do
  bash tools/tpu_gate.sh
  timeout 5400 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
      --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 300 \
      --batch-size 32 --physics sobel_fvcg --seed $SEED --no-plot \
      --run $((40 + SEED)) \
      > logs/hybrid_kle512_300ep_seed$SEED.log 2>&1
done

# --- 4. hybrid channelized + 5x5 sobel -------------------------------------
bash tools/tpu_gate.sh
timeout 5400 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data channelized --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics sobel_fvcg --sobel-size 5 --seed 1 --no-plot \
    --run 44 \
    > logs/hybrid_channelized_sobel5_300ep.log 2>&1

# --- 5. tuned 128: hybrid + sobel5 + wb50 ----------------------------------
bash tools/tpu_gate.sh
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics sobel_fvcg --sobel-size 5 --weight-bound 50 \
    --seed 1 --no-plot --run 45 \
    > logs/hybrid_kle512_im128_tuned_300ep.log 2>&1

echo CAMPAIGN_R3G_DONE
