#!/bin/bash
# Campaign F: the reference README's "more difficult" cGlow headline config
# (README.md:79-83) — kle512 over 64x64, ntrain 8192, enc [3,3,3,3],
# flow [4,4,4,4], beta 150, lr 1e-3 — never yet run in this framework.
# Then a bench sanity pass so the end-of-round bench gate isn't cold.
cd /root/repo || exit 1
while [ ! -f logs/after_e.done ]; do sleep 60; done
# 200 epochs (not the reference's 400) with frequent checkpoints: at the
# projected ~1 min/epoch this stays inside the round and is resumable
# (--resume) for a longer schedule later.
timeout 21600 python -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
  --beta 150 --ntrain 8192 --ntest 512 --kle 512 --imsize 64 --lr 0.001 \
  --enc-blocks 3,3,3,3 --flow-blocks 4,4,4,4 --seed 1 \
  --epochs 200 --ckpt-freq 50 \
  > logs/cglow_kle512_im64.log 2>&1
python bench.py > logs/bench_postF.log 2>&1
echo done > logs/campaign_r2f.done
