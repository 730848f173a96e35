#!/bin/bash
# Campaign G (replaces F's waiter): front-load the short TPU jobs, then the
# multi-hour cGlow headline run, post-processing, and bench.
#   1. slab-vs-concat dense-block probe (decides the default impl)
#   2. channelized retry: wb10 + 5x5 Sobel, 600 ep (wb50 degraded u there —
#      logs/canon_channelized_wb50.log)
#   3. big cGlow (reference README.md:79-83), 200 resumable epochs
#   4. post_cglow on that run; 5. bench sanity
cd /root/repo || exit 1
while [ ! -f logs/after_e.done ]; do sleep 60; done
timeout 1800 python tools/slab_probe.py > logs/slab_probe.log 2>&1
timeout 2400 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --data channelized --ntrain 4096 --ntest 512 --epochs 600 --seed 1 \
  --run 3 --sobel-size 5 \
  > logs/canon_channelized_sobel5.log 2>&1
timeout 21600 python -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
  --beta 150 --ntrain 8192 --ntest 512 --kle 512 --imsize 64 --lr 0.001 \
  --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --seed 1 \
  --epochs 200 --ckpt-freq 50 \
  > logs/cglow_kle512_im64.log 2>&1
run_dir=$(ls -dt experiments/cglow/reverse_kld/*kle512*ntrain8192* 2>/dev/null | head -1)
if [ -n "$run_dir" ]; then
  timeout 3600 python -m pde_surrogate_tpu.cli.post_cglow \
    --run-dir "$run_dir" > logs/post_cglow_kle512.log 2>&1
fi
python bench.py > logs/bench_postG.log 2>&1
echo done > logs/campaign_r2g.done
