#!/bin/bash
# Campaign T (after S): retry the wb150 seed-2 leg of campaign P — it died
# at startup on the transient axon UNAVAILABLE error (the documented
# instability failure mode; CLAUDE.md says retry). Seed 2 is the seed whose
# u R^2 collapsed to -3.8 at wb50/1000ep, so it is the probe of whether a
# 3x stronger boundary pin (wb150) removes the u cooldown lottery.
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2u.done ]; do sleep 120; done
for attempt in 1 2; do
  bash tools/tpu_gate.sh
  timeout 5400 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --ntrain 4096 --ntest 512 --epochs 1000 --seed 2 --run 15 --sobel-size 5 \
    --weight-bound 150 > logs/canon_kle512_run15_wb150_1000ep_seed2.log 2>&1 \
    && break
  sleep 60
done
echo done > logs/campaign_r2t.done
