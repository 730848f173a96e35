#!/bin/bash
# Campaign J (after I): does the schedule trend continue? 600 -> 1000
# epochs improved every channel (cooldown re-lands u); try 2000.
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2i.done ]; do sleep 120; done
timeout 7200 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 2000 --seed 1 --run 11 --sobel-size 5 \
  --weight-bound 50 > logs/canon_kle512_run11_wb50_2000ep.log 2>&1
python bench.py > logs/bench_postJ.log 2>&1
echo done > logs/campaign_r2j.done
