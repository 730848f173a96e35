#!/bin/bash
# Round-3 campaign C: resolution scaling (VERDICT item 4) + HBM-wall
# evidence (VERDICT item 1) + bench validation.  Waits for campaign B.
# Launch:  nohup bash tools/run_campaign_r3c.sh > logs/campaign_r3c.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

while ! grep -q CAMPAIGN_R3B_DONE logs/campaign_r3b.log 2>/dev/null; do
  sleep 120
done

# --- fvcg: the CG-preconditioned error objective (round-3 headline) ----
# The plain FV residual trains to ~0 loss with wrong fields (conditioning,
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

# --- 128x128 canonical label-free training (VERDICT item 4) ------------
# Dataset (inputs + 512 labeled test fields at 128^2) is generated lazily
# by ensure_dataset on first run; CG label solves scale iterations with n.
bash tools/tpu_gate.sh
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --seed 1 --no-plot --run 30 \
    > logs/canon_kle512_im128_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fv --seed 1 --no-plot --run 31 \
    > logs/fv_kle512_im128_300ep.log 2>&1

# --- HBM-wall probe: stream BW + analytic floor + trace (item 1) -------
bash tools/tpu_gate.sh
timeout 3600 $PY tools/hbm_probe.py --trace experiments/hbm_trace \
    > logs/hbm_probe_r3.log 2>&1
bash tools/tpu_gate.sh
timeout 3600 $PY tools/hbm_probe.py --dtype bf16 --batch 128 \
    > logs/hbm_probe_r3_bf16_bs128.log 2>&1

# --- bench end-to-end validation (new cglow section must not break the
# driver's round-end run) ----------------------------------------------
bash tools/tpu_gate.sh
timeout 7200 $PY bench.py > logs/bench_r3_check.json \
    2> logs/bench_r3_check.log

echo CAMPAIGN_R3C_DONE
