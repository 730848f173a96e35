#!/bin/bash
# Campaign Q (after P): retry the nonlinear conv-solver canonical run —
# campaign O's first leg died on a transient axon backend error
# (UNAVAILABLE at startup, right after the previous run was SIGTERMed;
# CLAUDE.md documents retry as the fix). Retry once more on failure.
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2p.done ]; do sleep 120; done
for attempt in 1 2; do
  timeout 1800 python -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
    --data grf --kle 1024 --idx 8 --nonlinear --alpha1 0.1 --alpha2 0.1 \
    > logs/solve_conv_nonlinear_kle1024.log 2>&1 && break
  sleep 60
done
echo done > logs/campaign_r2q.done
