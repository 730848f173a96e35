#!/bin/bash
# Round-3 campaign D2: the remaining campaign-D legs after the fvcg
# channelized leg hung 35 min in the scanned-epoch compile with no output
# (killed 02:48; bisected by tools/fvcg_compile_probe.py).  Probes and
# cheap reruns FIRST so the round cutoff costs the least; fvcg legs at the
# tail, gated on the compile probe having succeeded.  Appends to
# logs/campaign_r3d.log markers so campaign E's wait loop still works.
# Launch:
#   nohup bash tools/run_campaign_r3d2.sh > logs/campaign_r3d2.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

# --- probes: HBM wall (VERDICT item 1), glow scan anomaly (item 2) -------
bash tools/tpu_gate.sh
timeout 3600 $PY tools/hbm_probe.py --trace experiments/hbm_trace \
    > logs/hbm_probe_r3.log 2>&1

bash tools/tpu_gate.sh
timeout 3600 $PY tools/hbm_probe.py --dtype bf16 --batch 128 \
    > logs/hbm_probe_r3_bf16_bs128.log 2>&1

bash tools/tpu_gate.sh
timeout 3600 $PY tools/glow_scan_probe.py > logs/glow_scan_probe_r3.log 2>&1

# --- cheap lost-log reruns (item 3; solve_fc log already committed) ------
for seed in 2 3; do
  bash tools/tpu_gate.sh
  timeout 3600 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
      --data grf_kle512 --ntrain 512 --ntest 512 --epochs 100 \
      --batch-size 32 --seed $seed --no-plot --run 10$seed \
      > logs/ab_jax_kle512_seed$seed.log 2>&1
done

# --- fvcg: CG-preconditioned error objective -----------------------------
# Only if the compile probe proved the epoch program compiles: marker file
# written by the session after reading logs/fvcg_compile_probe.log.
if [ -f /tmp/fvcg_compile_ok ]; then
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
fi

echo CAMPAIGN_R3D_DONE >> logs/campaign_r3d.log
echo CAMPAIGN_R3D_DONE
