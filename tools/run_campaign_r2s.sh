#!/bin/bash
# Campaign S (after R): full UQ suite on the second cGlow kle512@64
# extension (reverse_kld_ext2), validating the 600-epoch-equivalent model
# end-to-end over the 10k Monte-Carlo set.
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2r.done ]; do sleep 120; done
ext2="experiments/cglow/reverse_kld_ext2/kle512_ntrain8192_ENC_blocks[3, 3, 3, 3]_FLOW_blocks[4, 4, 4, 4]_wb50.0_beta150.0_batch32_lr0.0001_epochs200"
if [ -d "$ext2" ]; then
  timeout 3600 python -m pde_surrogate_tpu.cli.post_cglow \
    --run-dir "$ext2" > logs/post_cglow_kle512_ext2.log 2>&1
fi
echo done > logs/campaign_r2s.done
