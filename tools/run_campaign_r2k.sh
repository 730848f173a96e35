#!/bin/bash
# Campaign K (after J): the wide coupling net at the canonical 32x32
# config — first real-config exercise of --coupling wide.
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2j.done ]; do sleep 120; done
timeout 7200 python -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
  --beta 150 --ntrain 4096 --kle 100 --imsize 32 --seed 1 \
  --coupling wide --epochs 400 \
  > logs/cglow_kle100_wide.log 2>&1
echo done > logs/campaign_r2k.done
