#!/bin/bash
# Round-3 campaign E (waits for campaign D2's marker in campaign_r3d.log):
# value-per-minute order for the round cutoff.  The two sobel_fvcg hybrid
# legs are the round's accuracy shot: fvcg alone proved the CG error term
# pins u (channelized u R^2 0.77 -> 0.982 label-free) but loses fluxes;
# the hybrid keeps sobel's flux supervision and adds the u anchor.
# Launch:
#   nohup bash tools/run_campaign_r3e.sh > logs/campaign_r3e.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

while ! grep -q CAMPAIGN_R3D_DONE logs/campaign_r3d.log 2>/dev/null; do
  sleep 120
done

# --- 1. shared-BN-stats dense block A/B (perf candidate) -----------------
bash tools/tpu_gate.sh
timeout 3600 $PY tools/sharedstats_probe.py > logs/sharedstats_probe_r3.log 2>&1

# --- 2. hybrid objective: channelized (the wall-breaking shot) -----------
bash tools/tpu_gate.sh
timeout 5400 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data channelized --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics sobel_fvcg --seed 1 --no-plot --run 26 \
    > logs/hybrid_channelized_300ep.log 2>&1

# --- 3. hybrid objective: kle512 (the u-lottery shot) --------------------
bash tools/tpu_gate.sh
timeout 5400 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics sobel_fvcg --seed 1 --no-plot --run 27 \
    > logs/hybrid_kle512_300ep.log 2>&1

# --- 4. 128x128 resolution scaling, canonical Sobel ----------------------
bash tools/tpu_gate.sh
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --seed 1 --no-plot --run 30 \
    > logs/canon_kle512_im128_300ep.log 2>&1

# --- 5. cGlow kle512@64 200ep donor (ckpt every 50; cutoff-tolerant) -----
bash tools/tpu_gate.sh
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
    --beta 150 --ntrain 8192 --ntest 512 --kle 512 --imsize 64 --lr 0.001 \
    --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --epochs 200 --ckpt-freq 50 \
    > logs/cglow_kle512_im64_200ep.log 2>&1

# --- 6. tail (runs only if time allows) ----------------------------------
bash tools/tpu_gate.sh
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics sobel_fvcg --seed 1 --no-plot --run 31 \
    > logs/hybrid_kle512_im128_300ep.log 2>&1

DONOR=$(ls -d experiments/cglow/reverse_kld/* 2>/dev/null | head -1)
if [ -n "$DONOR" ]; then
  bash tools/tpu_gate.sh
  timeout 10800 $PY -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
      --beta 150 --ntrain 8192 --ntest 512 --kle 512 --imsize 64 --lr 0.0002 \
      --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --epochs 200 --ckpt-freq 50 \
      --exp-name cglow/reverse_kld_ext --init-from "$DONOR:200" \
      > logs/cglow_kle512_im64_ext.log 2>&1

  EXTDIR=$(ls -d experiments/cglow/reverse_kld_ext/* 2>/dev/null | head -1)
  if [ -n "$EXTDIR" ]; then
    bash tools/tpu_gate.sh
    timeout 7200 $PY -m pde_surrogate_tpu.cli.post_cglow --run-dir "$EXTDIR" \
        > logs/post_cglow_ext_r3.log 2>&1
  fi
fi

echo CAMPAIGN_R3E_DONE
