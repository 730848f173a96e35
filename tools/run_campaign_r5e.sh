#!/bin/bash
# Round-5 campaign E: canonical-cGlow retry (200 ep, no data-init).
# The as-written run (lr 1e-3, identity-init ActNorms) destabilized at
# max lr exactly as the reference README warns for this config
# ("potentially unstable training", README.md:84) and died to NaN at
# epoch 118 (logs/cglow_kle512_im64_canonical_300ep.log) — params went
# non-finite so the apply_if_finite guard can only freeze, not recover.
# Round 3 ran THIS exact config at 200 ep WITHOUT data-init successfully;
# the 300-ep schedule lingers at max lr and blows up. 200 ep, no data-init
# before the 20:45 UTC guard.  Then the r5d tail.
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual"
GLOW="$PY -m pde_surrogate_tpu.cli.train_cglow_reverse_kl"
POST="$PY -m pde_surrogate_tpu.cli.post_cglow"
CUTOFF=1787258700   # 20:45 UTC
guard() { [ "$(date +%s)" -lt "$CUTOFF" ] || { echo CAMPAIGN_R5D_DONE; echo CAMPAIGN_R5E_DONE; exit 0; }; }

guard
bash tools/tpu_gate.sh
timeout 7200 $GLOW \
    --beta 150 --ntrain 8192 --kle 512 --imsize 64 --lr 0.001 \
    --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --epochs 200 \
    --ntest 512 --no-plot \
    > logs/cglow_kle512_im64_canonical_200ep.log 2>&1

CANON=$(ls -d "experiments/cglow/reverse_kld/kle512_ntrain8192_ENC_blocks[3, 3, 3, 3]"*epochs200_im64 2>/dev/null | head -1)
if [ -n "$CANON" ]; then
    guard
    bash tools/tpu_gate.sh
    timeout 3600 $POST --run-dir "$CANON" --n-monte-carlo 10000 \
        --ntest 512 --batch-size 64 \
        > logs/post_cglow_kle512_canonical.log 2>&1
fi

guard
bash tools/tpu_gate.sh
timeout 2700 $TRAIN \
    --data warped_grf --imsize 64 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 81 \
    > logs/fvcg2_warped_300ep.log 2>&1

guard
bash tools/tpu_gate.sh
timeout 2100 $PY tools/pallas_cg_sweep.py > logs/pallas_cg_sweep_r5.log 2>&1

guard
bash tools/tpu_gate.sh
timeout 1500 $PY tools/remat_probe.py > logs/remat_probe_r5.log 2>&1

echo CAMPAIGN_R5D_DONE
echo CAMPAIGN_R5E_DONE
