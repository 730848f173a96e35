#!/bin/bash
# Campaign W: consolidated replacement for the Q -> R -> U chain after the
# 21:0x-22:1x UTC TPU outage burned campaign P's legs and hung Q's first
# attempt. Every leg now waits for a TPU health probe (tools/tpu_gate.sh)
# before launching, so retries only spend attempts on a live backend.
# Legs, in order:
#   1. (Q) nonlinear conv-solver canonical run
#   2. (R) FC solver off-grid collocation
#   3. (U1) FC solver on warped GRF idx 8      — BASELINE family matrix
#   4. (U2) FC solver on channelized idx 8     — BASELINE family matrix
#   5. (U3) canonical kle512@64 codec, --dtype bf16 accuracy probe
#   6. (U4) 128x128 label-free codec probe (beyond-reference resolution)
# Ends by writing campaign_r2u.done so the gated T (wb150 seed 2) and then
# S (cGlow ext2) watchers proceed.
cd /root/repo || exit 1

run_leg() { # run_leg <timeout_s> <logfile> <cmd...>
  local t="$1" log="$2"; shift 2
  for attempt in 1 2; do
    bash tools/tpu_gate.sh
    timeout "$t" "$@" > "$log" 2>&1 && return 0
    sleep 60
  done
  return 1
}

run_leg 1800 logs/solve_conv_nonlinear_kle1024.log \
  python -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
  --data grf --kle 1024 --idx 8 --nonlinear --alpha1 0.1 --alpha2 0.1
echo done > logs/campaign_r2q.done

run_leg 1800 logs/solve_fc_kle512_offgrid.log \
  python -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
  --data grf --kle 512 --idx 8 --off-grid
echo done > logs/campaign_r2r.done

run_leg 1800 logs/solve_fc_warped.log \
  python -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
  --data warped_grf --idx 8

run_leg 1800 logs/solve_fc_channelized.log \
  python -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
  --data channelized --idx 8

run_leg 3600 logs/canon_kle512_run20_bf16.log \
  python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --ntrain 4096 --ntest 512 --epochs 300 --seed 1 --run 20 --dtype bf16

run_leg 7200 logs/canon_kle512_run21_im128.log \
  python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
  --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 --seed 1 --run 21

echo done > logs/campaign_r2u.done
