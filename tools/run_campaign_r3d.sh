#!/bin/bash
# Round-3 campaign D: rebuild from the 2026-08-18 container reset (datasets/
# and experiments/ wiped; only git survived) and run the remaining round-3
# legs: fvcg objective (VERDICT 1/6 headline idea), glow-scan + HBM probes
# (VERDICT items 1-2 evidence), and the cheap lost-log reruns (item 3).
# Sequential: ONE TPU process at a time.  Launch:
#   nohup bash tools/run_campaign_r3d.sh > logs/campaign_r3d.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

# --- datasets (canonical sizes; everything downstream reads these) ------
bash tools/tpu_gate.sh
timeout 5400 $PY -m pde_surrogate_tpu.cli.make_dataset --family channelized \
    --imsize 64 --ntrain 4096 --ntest 512 --train-labels \
    > logs/gen_channelized.log 2>&1

bash tools/tpu_gate.sh
timeout 10800 $PY -m pde_surrogate_tpu.cli.make_dataset --family grf \
    --kle 512 --imsize 64 --ntrain 10000 --nval 1000 --ntest 1000 \
    --n-monte-carlo 10000 --train-labels \
    > logs/gen_kle512.log 2>&1

# --- fvcg: CG-preconditioned error objective (round-3 headline) ---------
# The plain FV residual trains to ~0 loss with wrong fields (conditioning;
# logs/fv_channelized_300ep.log); fvcg penalizes the CG-recovered ERROR.
bash tools/tpu_gate.sh
timeout 5400 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data channelized --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 24 \
    > logs/fvcg_channelized_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 5400 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 25 \
    > logs/fvcg_kle512_300ep.log 2>&1

# --- probes: glow scan anomaly (item 2), HBM wall (item 1) --------------
bash tools/tpu_gate.sh
timeout 3600 $PY tools/glow_scan_probe.py > logs/glow_scan_probe_r3.log 2>&1

bash tools/tpu_gate.sh
timeout 3600 $PY tools/hbm_probe.py --trace experiments/hbm_trace \
    > logs/hbm_probe_r3.log 2>&1
bash tools/tpu_gate.sh
timeout 3600 $PY tools/hbm_probe.py --dtype bf16 --batch 128 \
    > logs/hbm_probe_r3_bf16_bs128.log 2>&1

# --- cheap lost-log reruns (item 3) --------------------------------------
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

echo CAMPAIGN_R3D_DONE
