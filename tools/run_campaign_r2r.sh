#!/bin/bash
# Campaign R (after Q): retry the FC off-grid leg — campaign O's second
# leg hung on a TPU RPC (no output for 18+ min, reaped by its timeout)
# during the 20:00-20:40 UTC instability window. Two attempts.
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2q.done ]; do sleep 120; done
for attempt in 1 2; do
  timeout 1800 python -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
    --data grf --kle 512 --idx 8 --off-grid \
    > logs/solve_fc_kle512_offgrid.log 2>&1 && break
  sleep 60
done
echo done > logs/campaign_r2r.done
