#!/bin/bash
# Round-5 campaign C: make-up leg — post_cglow UQ retry on the
# channelized @64 cGlow run (the r4l leg died mid-suite on a TPU worker
# crash).  Time-guarded like r5b: never start after 20:45 UTC so the
# chip is free for the driver's end-of-round bench.
set -x
cd "$(dirname "$0")/.." || exit 1
CUTOFF=1787258700
while ! grep -q CAMPAIGN_R5E_DONE logs/campaign_r5e.log 2>/dev/null; do
    sleep 120
done
[ "$(date +%s)" -lt "$CUTOFF" ] || { echo CAMPAIGN_R5C_DONE; exit 0; }
RUN64="experiments/cglow/reverse_kld/channelized_ntrain4096_ENC_blocks[3, 4, 4]_FLOW_blocks[6, 6, 6]_wb10.0_beta150.0_batch32_lr0.0015_epochs200_im64_fvcg"
bash tools/tpu_gate.sh
timeout 3600 python -m pde_surrogate_tpu.cli.post_cglow --run-dir "$RUN64" \
    --n-monte-carlo 10000 --ntest 512 --batch-size 64 \
    > logs/post_cglow_channelized_im64_retry.log 2>&1
echo CAMPAIGN_R5C_DONE
