#!/bin/bash
# Round-4 campaign L: conditional-Glow on the channelized family — the
# probabilistic surrogate on discontinuous K, which the reference never
# ships (its cGlow is GRF-KLE only) and which the round-4 pure-fvcg
# objective made tractable label-free (codec channelized R2 .996/.998/.984
# at the supervised ceiling, logs/fvcg2_channelized_300ep.log).
# Legs (value-ordered):
#  1. cGlow channelized@32, 400ep, --physics fvcg, wb10 (the codec fvcg
#     recipe's boundary weight; cGlow kle100@32 canonical is 400ep)
#  2. post_cglow UQ suite on leg 1 (family-matched MC/val sets via
#     uq_dataset_files)
#  3. cGlow channelized@64, 200ep, fvcg, wb10 (the headline size; 200ep
#     mirrors the kle512@64 canonical, extendable via --init-from)
#  4. post_cglow UQ suite on leg 3
# Waits for campaign r4k's DONE marker so the two queues never share the
# single-process TPU.
# Launch:
#   nohup bash tools/run_campaign_r4l.sh > logs/campaign_r4l.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_cglow_reverse_kl"
POST="$PY -m pde_surrogate_tpu.cli.post_cglow"

while ! grep -q CAMPAIGN_R4K_DONE logs/campaign_r4k.log 2>/dev/null; do
    sleep 120
done

# Leg 0 (moved ahead of the cGlow legs): pure fvcg kle512@128 at
# --fvcg-iters 256, 300ep — the VERDICT-r3 0.95 u-gate shot.  The CPU
# anchor-resolution probe (logs/fvcg_anchor_resolution_probe_r4.log)
# measured the anchor target at 0.0012/0.0033 rel-L2 (u/flux) at this
# depth vs 0.017/0.037 at the grid default, so this leg has
# supervised-class headroom; highest value-per-minute in the queue.
bash tools/tpu_gate.sh
timeout 10800 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics fvcg --fvcg-iters 256 --seed 1 --no-plot \
    --run 73 \
    > logs/fvcg2_kle512_im128_cg256_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 7200 $TRAIN \
    --data channelized --imsize 32 --ntrain 4096 --ntest 512 \
    --epochs 400 --batch-size 32 --physics fvcg --weight-bound 10 \
    --no-plot \
    > logs/cglow_channelized_im32_fvcg_400ep.log 2>&1

RUN32=$(ls -d experiments/cglow/reverse_kld/channelized_ntrain4096_*epochs400_fvcg 2>/dev/null | head -1)
if [ -n "$RUN32" ]; then
    bash tools/tpu_gate.sh
    timeout 5400 $POST --run-dir "$RUN32" --n-monte-carlo 10000 \
        --ntest 512 --batch-size 64 \
        > logs/post_cglow_channelized_im32.log 2>&1
fi

bash tools/tpu_gate.sh
timeout 10800 $TRAIN \
    --data channelized --imsize 64 --ntrain 4096 --ntest 512 \
    --epochs 200 --batch-size 32 --physics fvcg --weight-bound 10 \
    --no-plot \
    > logs/cglow_channelized_im64_fvcg_200ep.log 2>&1

RUN64=$(ls -d experiments/cglow/reverse_kld/channelized_ntrain4096_*_im64_fvcg 2>/dev/null | head -1)
if [ -n "$RUN64" ]; then
    bash tools/tpu_gate.sh
    timeout 5400 $POST --run-dir "$RUN64" --n-monte-carlo 10000 \
        --ntest 512 --batch-size 64 \
        > logs/post_cglow_channelized_im64.log 2>&1
fi

echo CAMPAIGN_R4L_DONE
