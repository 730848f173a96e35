#!/bin/bash
# Campaign L (after K): UQ post-processing on the kle512 extension model
# (the --init-from warm-started run — best kle512 flow so far), completing
# the train -> extend -> UQ story; then a fresh bench with the HBM metrics.
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2k.done ]; do sleep 120; done
ext=$(ls -dt experiments/cglow/reverse_kld_ext/*kle512* 2>/dev/null | head -1)
if [ -n "$ext" ] && [ -d "$ext/checkpoints" ]; then
  timeout 3600 python -m pde_surrogate_tpu.cli.post_cglow \
    --run-dir "$ext" > logs/post_cglow_kle512_ext.log 2>&1
fi
python bench.py > logs/bench_postL.log 2>&1
echo done > logs/campaign_r2l.done
