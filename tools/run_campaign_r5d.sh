#!/bin/bash
# Round-5 campaign D: the canonical cGlow leg re-queued after the ntrain-
# 8192 dataset fix (the 64^2 train design was a post-reset 4096-sample
# regeneration; the full lhs10000 design now exists — old file kept as
# .n4096_vintage).  Then the remaining r5b tail.  All legs time-guarded.
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual"
GLOW="$PY -m pde_surrogate_tpu.cli.train_cglow_reverse_kl"
POST="$PY -m pde_surrogate_tpu.cli.post_cglow"
CUTOFF=1787258700   # 20:45 UTC
guard() { [ "$(date +%s)" -lt "$CUTOFF" ] || { echo CAMPAIGN_R5B_DONE; echo CAMPAIGN_R5D_DONE; exit 0; }; }

# NOTE: an earlier revision pattern-waited on the warped@32 leg here and
# deadlocked — the session shell wrapper that LAUNCHED this script holds
# the whole script text (pattern included) in its own command line, so
# pgrep matched forever (the CLAUDE.md never-kill-by-pattern trap, wait
# flavor).  The leg had already exited; tpu_gate is the only wait needed.

guard
bash tools/tpu_gate.sh
timeout 9600 $GLOW \
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
echo CAMPAIGN_R5D_DONE
