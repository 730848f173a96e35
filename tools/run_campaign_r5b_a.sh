#!/bin/bash
# Round-5 campaign B, variant A (600ep gate HIT >=0.95: wall cracked).
# Canonical cGlow gets the prime slot; 128^2 shots become bonus.
#  1. Reference canonical 64x64 cGlow AS WRITTEN (400 ep) + UQ suite
#  2. warped codec fvcg @64, @32
#  3. remat probe; pallas sweep
# Ends leaving the chip free for the driver's end-of-round bench.
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual"
GLOW="$PY -m pde_surrogate_tpu.cli.train_cglow_reverse_kl"
POST="$PY -m pde_surrogate_tpu.cli.post_cglow"
while ! grep -q CAMPAIGN_R5A_DONE logs/campaign_r5a.log 2>/dev/null; do
    sleep 60
done
bash tools/tpu_gate.sh
timeout 13500 $GLOW \
    --beta 150 --ntrain 8192 --kle 512 --imsize 64 --lr 0.001 \
    --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --epochs 400 \
    --ntest 512 --no-plot \
    > logs/cglow_kle512_im64_canonical_400ep.log 2>&1
CANON=$(ls -d "experiments/cglow/reverse_kld/kle512_ntrain8192_ENC_blocks[3, 3, 3, 3]"* 2>/dev/null | head -1)
if [ -n "$CANON" ]; then
    bash tools/tpu_gate.sh
    timeout 3600 $POST --run-dir "$CANON" --n-monte-carlo 10000 \
        --ntest 512 --batch-size 64 \
        > logs/post_cglow_kle512_canonical.log 2>&1
fi
bash tools/tpu_gate.sh
timeout 2700 $TRAIN \
    --data warped_grf --imsize 64 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 81 \
    > logs/fvcg2_warped_300ep.log 2>&1
bash tools/tpu_gate.sh
timeout 1500 $TRAIN \
    --data warped_grf --imsize 32 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 82 \
    > logs/fvcg2_warped_im32_300ep.log 2>&1
bash tools/tpu_gate.sh
timeout 1500 $PY tools/remat_probe.py > logs/remat_probe_r5.log 2>&1
bash tools/tpu_gate.sh
timeout 2100 $PY tools/pallas_cg_sweep.py > logs/pallas_cg_sweep_r5.log 2>&1
echo CAMPAIGN_R5B_DONE
