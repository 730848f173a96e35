#!/bin/bash
# Campaign S (after X), restructured: the first ext2 attempt hung in
# model init on a TPU RPC (killed by hand, 20:36-21:05 UTC instability).
# Retrain the second cGlow kle512@64 extension (2 attempts), then run the
# full UQ suite on it.
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2x.done ]; do sleep 120; done
src="experiments/cglow/reverse_kld_ext/kle512_ntrain8192_ENC_blocks[3, 3, 3, 3]_FLOW_blocks[4, 4, 4, 4]_wb50.0_beta150.0_batch32_lr0.0002_epochs200"
for attempt in 1 2; do
  bash tools/tpu_gate.sh
  timeout 10800 python -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
    --beta 150 --ntrain 8192 --ntest 512 --kle 512 --imsize 64 --lr 0.0001 \
    --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --seed 1 \
    --epochs 200 --ckpt-freq 50 --exp-name cglow/reverse_kld_ext2 \
    --init-from "$src:200" > logs/cglow_kle512_im64_ext2.log 2>&1 && break
  sleep 60
done
ext2="experiments/cglow/reverse_kld_ext2/kle512_ntrain8192_ENC_blocks[3, 3, 3, 3]_FLOW_blocks[4, 4, 4, 4]_wb50.0_beta150.0_batch32_lr0.0001_epochs200"
if [ -f "$ext2/checkpoints/model_epoch200.msgpack" ]; then
  bash tools/tpu_gate.sh
  timeout 3600 python -m pde_surrogate_tpu.cli.post_cglow \
    --run-dir "$ext2" > logs/post_cglow_kle512_ext2.log 2>&1
fi
echo done > logs/campaign_r2s.done
