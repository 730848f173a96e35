#!/bin/bash
# Round-3 campaign F: finish what campaign E's casualties left open.
#  1. sharedstats probe rerun (tolerance fixed to 1e-3 after the 1.01e-4
#     fusion-order miss in logs/sharedstats_probe_r3.log)
#  2. pallas CG n=128 hardware validation of _auto_fields_per_program
#  3. canonical Sobel 128x128 300ep rerun (leg 4 of E died on the VMEM
#     overflow this fix removes)
#  4. cGlow kle512@64 resume ep100 -> 200 (E's leg 5 was hang-killed at 103)
#  5. cGlow extension 200ep at lr 2e-4 from the finished donor
#  6. post_cglow UQ suite on the extension
# Launch:
#   nohup bash tools/run_campaign_r3f.sh > logs/campaign_r3f.log 2>&1 &
#   echo $! > /tmp/r3f.pid   # verify against ps; see CLAUDE.md orphan note
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

# --- 1. shared-BN-stats equivalence (fixed tolerance) ---------------------
bash tools/tpu_gate.sh
timeout 3600 $PY tools/sharedstats_probe.py > logs/sharedstats_probe_r3b.log 2>&1

# --- 2. pallas CG @128 autosized-VMEM validation ---------------------------
bash tools/tpu_gate.sh
timeout 3600 $PY tools/pallas_probe.py --n 128 --batch 32 \
    > logs/pallas128_probe_r3.log 2>&1

# --- 3. canonical Sobel 128x128 rerun --------------------------------------
bash tools/tpu_gate.sh
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --seed 1 --no-plot --run 32 \
    > logs/canon_kle512_im128_300ep_f.log 2>&1

# --- 4. cGlow kle512@64: resume ep100 -> 200 -------------------------------
bash tools/tpu_gate.sh
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
    --beta 150 --ntrain 8192 --ntest 512 --kle 512 --imsize 64 --lr 0.001 \
    --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --epochs 200 --ckpt-freq 50 \
    --resume \
    > logs/cglow_kle512_im64_200ep_resume.log 2>&1

# --- 5. extension (only if the donor reached 200) ---------------------------
DONOR=$(ls -d experiments/cglow/reverse_kld/* 2>/dev/null | head -1)
if [ -f "$DONOR/checkpoints/model_epoch200.msgpack" ]; then
  bash tools/tpu_gate.sh
  timeout 10800 $PY -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
      --beta 150 --ntrain 8192 --ntest 512 --kle 512 --imsize 64 --lr 0.0002 \
      --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --epochs 200 --ckpt-freq 50 \
      --exp-name cglow/reverse_kld_ext --init-from "$DONOR:200" \
      > logs/cglow_kle512_im64_ext.log 2>&1

  EXTDIR=$(ls -d experiments/cglow/reverse_kld_ext/* 2>/dev/null | head -1)
  if [ -f "$EXTDIR/checkpoints/model_epoch200.msgpack" ]; then
    bash tools/tpu_gate.sh
    timeout 7200 $PY -m pde_surrogate_tpu.cli.post_cglow --run-dir "$EXTDIR" \
        > logs/post_cglow_ext_r3.log 2>&1
  fi
fi

echo CAMPAIGN_R3F_DONE
