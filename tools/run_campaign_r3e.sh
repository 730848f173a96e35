#!/bin/bash
# Round-3 campaign E (waits for campaign D): legs ordered by value-per-minute
# so an end-of-round cutoff costs the least-important tail, not the head:
#   1. shared-stats A/B probe (fast; possible throughput-headline change)
#   2. 128x128 canonical codec (VERDICT item 4 resolution-scaling row)
#   3. cGlow kle512@64 200ep donor (flagship rebuild; RESULTS cites it)
#   4. 128x128 fvcg row
#   5. cGlow warm-start extension + its UQ suite (round-2 recipe)
# bench.py is NOT run here — the round driver runs it at round end.  Launch:
#   nohup bash tools/run_campaign_r3e.sh > logs/campaign_r3e.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

while ! grep -q CAMPAIGN_R3D_DONE logs/campaign_r3d.log 2>/dev/null; do
  sleep 120
done

# --- shared-BN-stats dense block A/B (round-3 perf candidate) ------------
bash tools/tpu_gate.sh
timeout 3600 $PY tools/sharedstats_probe.py > logs/sharedstats_probe_r3.log 2>&1

# --- 128x128 resolution scaling, canonical Sobel (VERDICT item 4) --------
# Datasets generated lazily by ensure_dataset (CG label iters scale with n).
bash tools/tpu_gate.sh
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --seed 1 --no-plot --run 30 \
    > logs/canon_kle512_im128_300ep.log 2>&1

# --- cGlow kle512@64: 200ep donor ----------------------------------------
bash tools/tpu_gate.sh
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
    --beta 150 --ntrain 8192 --ntest 512 --kle 512 --imsize 64 --lr 0.001 \
    --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --epochs 200 --ckpt-freq 50 \
    > logs/cglow_kle512_im64_200ep.log 2>&1

# --- 128x128 fvcg row ----------------------------------------------------
bash tools/tpu_gate.sh
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 31 \
    > logs/fvcg_kle512_im128_300ep.log 2>&1

# --- cGlow 200ep warm-start extension + UQ suite -------------------------
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
