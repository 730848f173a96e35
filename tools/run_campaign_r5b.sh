#!/bin/bash
# Round-5 campaign B (final form, decided 16:30 UTC from the controls):
# run 75 (600 ep, cg256) landed u R^2 0.921 — schedule ruled out; the
# supervised MLE control @128^2 is landing in the SAME ~0.90-0.93 band
# WITH labels — so the 128^2 wall is capacity/receptive field, not the
# label-free objective.  Gate shot = the receptive-field-matched 5-block
# codec.  Then the canonical cGlow row (300 ep so train + UQ complete
# inside the round) and the quick matrix/probe legs, each behind a
# wall-clock guard (no new leg after 20:45 UTC) so the chip is FREE when
# the driver's end-of-round bench fires (the r4 bench artifact was lost
# to exactly that collision).
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual"
GLOW="$PY -m pde_surrogate_tpu.cli.train_cglow_reverse_kl"
POST="$PY -m pde_surrogate_tpu.cli.post_cglow"
CUTOFF=1787258700   # 20:45 UTC
guard() { [ "$(date +%s)" -lt "$CUTOFF" ] || { echo CAMPAIGN_R5B_DONE; exit 0; }; }

while ! grep -q CAMPAIGN_R5A_DONE logs/campaign_r5a.log 2>/dev/null; do
    sleep 60
done

guard
bash tools/tpu_gate.sh
timeout 5400 $TRAIN \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --fvcg-iters 256 --seed 1 \
    --blocks 4,6,8,6,4 --no-plot --run 84 \
    > logs/fvcg2_kle512_im128_cg256_deep5_300ep.log 2>&1

guard
bash tools/tpu_gate.sh
timeout 10200 $GLOW \
    --beta 150 --ntrain 8192 --kle 512 --imsize 64 --lr 0.001 \
    --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --epochs 300 \
    --ntest 512 --no-plot \
    > logs/cglow_kle512_im64_canonical_300ep.log 2>&1

CANON=$(ls -d "experiments/cglow/reverse_kld/kle512_ntrain8192_ENC_blocks[3, 3, 3, 3]"* 2>/dev/null | head -1)
if [ -n "$CANON" ]; then
    guard
    bash tools/tpu_gate.sh
    timeout 3600 $POST --run-dir "$CANON" --n-monte-carlo 10000 \
        --ntest 512 --batch-size 64 \
        > logs/post_cglow_kle512_canonical.log 2>&1
fi

guard
bash tools/tpu_gate.sh
timeout 1500 $TRAIN \
    --data warped_grf --imsize 32 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 82 \
    > logs/fvcg2_warped_im32_300ep.log 2>&1

guard
bash tools/tpu_gate.sh
timeout 2700 $TRAIN \
    --data warped_grf --imsize 64 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 81 \
    > logs/fvcg2_warped_300ep.log 2>&1

guard
bash tools/tpu_gate.sh
timeout 1500 $PY tools/remat_probe.py > logs/remat_probe_r5.log 2>&1

guard
bash tools/tpu_gate.sh
timeout 2100 $PY tools/pallas_cg_sweep.py > logs/pallas_cg_sweep_r5.log 2>&1

echo CAMPAIGN_R5B_DONE
