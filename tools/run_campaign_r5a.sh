#!/bin/bash
# Round-5 campaign A (VERDICT r4 "next round" items), value-per-minute order.
# The 128^2 root-cause matrix comes first (items 1), then the cheap family
# matrix + probes (items 5-7 + bench validation, item 2), then the long
# canonical-cGlow legs (item 4) and the warped cGlow leg (item 5).
# Legs:
#  1. Supervised MLE ceiling @128^2 (200 ep) — the missing capacity control:
#     if labels also land u ~0.93, the wall is capacity/receptive field, not
#     the label-free objective.  Attaches FV labels to the existing
#     inputs-only 128^2 train file in place (design-preserving).
#  2. Coarse-to-fine gate shot: pure fvcg cg256 @128^2 warm-started from the
#     64^2 pure-fvcg run (run 65 ep 300) via the new codec --init-from —
#     the fully-convolutional transfer lever (lr halved for fine-tune).
#  3. Receptive-field/capacity gate shot: 5-block [4,6,8,6,4] codec (extra
#     downsample stage => latent 16^2 at 128^2, matching the 64^2 model's
#     relative receptive field; 953k params) pure fvcg cg256, cold.
#  4. Pure fvcg on warped GRF @64 (the "recommended for both families"
#     claim measured on the third family).
#  5. Same @32 (supersedes the u R^2 0.227 small-denominator artifact row).
#  6. Remat probe: DenseED(remat=True) at f32/bs32 and bf16/bs128.
#  7. Pallas CG win-or-retire sweep.
#  8. bench.py validation run (budget + SIGTERM emission).
#  9. The reference's canonical 64x64 cGlow config AS WRITTEN
#     (README.md:79-83: beta 150, ntrain 8192, lr 1e-3, enc [3,3,3,3],
#     flow [4,4,4,4], 400 ep) — BASELINE.md row 5.
# 10. post_cglow UQ suite on leg 9.
# 11. One warped cGlow leg (@32, fvcg, wb10, 400 ep).
# 12. post_cglow UQ suite on leg 11.
# Waits for campaign r4m's DONE marker (single-process TPU).
# Launch:
#   nohup bash tools/run_campaign_r5a.sh > logs/campaign_r5a.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual"
MLE="$PY -m pde_surrogate_tpu.cli.train_codec_max_likelihood"
GLOW="$PY -m pde_surrogate_tpu.cli.train_cglow_reverse_kl"
POST="$PY -m pde_surrogate_tpu.cli.post_cglow"
SRC64="experiments/codec/mixed_residual/grf_kle512_ntrain4096_run65_bs32_lr0.001_epochs300_fvcg"

while ! grep -q CAMPAIGN_R4M_DONE logs/campaign_r4m.log 2>/dev/null; do
    sleep 120
done

bash tools/tpu_gate.sh
timeout 3600 $MLE \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 200 \
    --batch-size 32 --seed 1 --no-plot --run 80 \
    > logs/mle_kle512_im128_200ep.log 2>&1

bash tools/tpu_gate.sh
timeout 7200 $TRAIN \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --fvcg-iters 256 --lr 0.0005 --seed 1 \
    --init-from "$SRC64:300" --no-plot --run 83 \
    > logs/fvcg2_kle512_im128_cg256_c2f_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 7200 $TRAIN \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --fvcg-iters 256 --seed 1 \
    --blocks 4,6,8,6,4 --no-plot --run 84 \
    > logs/fvcg2_kle512_im128_cg256_deep5_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 3600 $TRAIN \
    --data warped_grf --imsize 64 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 81 \
    > logs/fvcg2_warped_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 1800 $TRAIN \
    --data warped_grf --imsize 32 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --seed 1 --no-plot --run 82 \
    > logs/fvcg2_warped_im32_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 1800 $PY tools/remat_probe.py > logs/remat_probe_r5.log 2>&1

bash tools/tpu_gate.sh
timeout 2400 $PY tools/pallas_cg_sweep.py > logs/pallas_cg_sweep_r5.log 2>&1

bash tools/tpu_gate.sh
BENCH_BUDGET_S=1380 timeout 1500 $PY bench.py \
    > logs/bench_r5_validation.log 2>&1

bash tools/tpu_gate.sh
timeout 14400 $GLOW \
    --beta 150 --ntrain 8192 --kle 512 --imsize 64 --lr 0.001 \
    --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --epochs 400 \
    --ntest 512 --no-plot \
    > logs/cglow_kle512_im64_canonical_400ep.log 2>&1

CANON=$(ls -d "experiments/cglow/reverse_kld/kle512_ntrain8192_ENC_blocks[3, 3, 3, 3]"* 2>/dev/null | head -1)
if [ -n "$CANON" ]; then
    bash tools/tpu_gate.sh
    timeout 5400 $POST --run-dir "$CANON" --n-monte-carlo 10000 \
        --ntest 512 --batch-size 64 \
        > logs/post_cglow_kle512_canonical.log 2>&1
fi

bash tools/tpu_gate.sh
timeout 7200 $GLOW \
    --data warped_grf --imsize 32 --ntrain 4096 --ntest 512 \
    --epochs 400 --batch-size 32 --physics fvcg --weight-bound 10 \
    --no-plot \
    > logs/cglow_warped_im32_fvcg_400ep.log 2>&1

WARPED=$(ls -d experiments/cglow/reverse_kld/warped_grf_ntrain4096_*_fvcg 2>/dev/null | head -1)
if [ -n "$WARPED" ]; then
    bash tools/tpu_gate.sh
    timeout 5400 $POST --run-dir "$WARPED" --n-monte-carlo 10000 \
        --ntest 512 --batch-size 64 \
        > logs/post_cglow_warped_im32.log 2>&1
fi

echo CAMPAIGN_R5A_DONE
