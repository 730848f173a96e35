#!/bin/bash
# Campaign P (after O): boundary-weight strength probe. Campaign M showed
# u's cooldown landing is a per-seed lottery at long schedules (seed 2:
# u R^2 0.99 at 600 ep but -3.8 at 1000 ep) while fluxes replicate. The
# failure mode is a near-constant interior offset, which only the
# Dirichlet boundary penalty constrains — test whether wb 150 pins it:
#   1. seed 2 (the 1000-ep failure) at wb150
#   2. seed 1 (the 1000-ep success) at wb150 — does it cost flux accuracy?
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2o.done ]; do sleep 120; done
timeout 5400 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 1000 --seed 2 --run 15 --sobel-size 5 \
  --weight-bound 150 > logs/canon_kle512_run15_wb150_1000ep_seed2.log 2>&1
timeout 5400 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 1000 --seed 1 --run 16 --sobel-size 5 \
  --weight-bound 150 > logs/canon_kle512_run16_wb150_1000ep_seed1.log 2>&1
echo done > logs/campaign_r2p.done
