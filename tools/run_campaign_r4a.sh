#!/bin/bash
# Round-4 campaign A (waits for campaign H's marker): VERDICT items 1/3/4/6.
#  1/2. channelized hybrid + CG-corrected FLUX anchor (fw 1 and 4): the one
#       place the framework loses to its supervised ceiling label-free
#       (flux R^2 0.84/0.45 vs 1.00/0.99). Target >= 0.95/0.93/0.80.
#  3.   kle512 non-regression with the flux anchor (target >= .99/.96/.87).
#  4.   128^2 hybrid with grid-scaled CG depth (n_cg defaults to n now)
#       + flux anchor + the canonical sobel5/wb50 recipe. Target u >= 0.95.
#  5.   shared-stats canonical 300ep accuracy-parity run (decide default).
#  6/7. 32x32 kle100/kle128 codec rows (BASELINE.md family matrix).
#  8.   warped-GRF codec row (family matrix).
# Launch:
#   nohup bash tools/run_campaign_r4a.sh > logs/campaign_r4a.log 2>&1 &
#   echo $! > /tmp/r4a.pid
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

while ! grep -q CAMPAIGN_R3H_DONE logs/campaign_r3h.log 2>/dev/null; do
  sleep 120
done

TRAIN="$PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual"

# --- 1/2. channelized flux-anchor sweep ------------------------------------
for FW in 1 4; do
  bash tools/tpu_gate.sh
  timeout 5400 $TRAIN \
      --data channelized --ntrain 4096 --ntest 512 --epochs 300 \
      --batch-size 32 --physics sobel_fvcg --fvcg-flux-weight $FW \
      --seed 1 --no-plot --run 50 \
      > logs/hybridflux_channelized_fw${FW}_300ep.log 2>&1
done

# --- 3. kle512 non-regression with the flux anchor --------------------------
bash tools/tpu_gate.sh
timeout 5400 $TRAIN \
    --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics sobel_fvcg --fvcg-flux-weight 1 \
    --seed 1 --no-plot --run 52 \
    > logs/hybridflux_kle512_fw1_300ep.log 2>&1

# --- 4. 128^2: grid-scaled CG + flux anchor + canonical recipe ---------------
bash tools/tpu_gate.sh
timeout 10800 $TRAIN \
    --data grf_kle512 --imsize 128 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --physics sobel_fvcg --fvcg-flux-weight 1 \
    --sobel-size 5 --weight-bound 50 --seed 1 --no-plot --run 53 \
    > logs/hybridflux_kle512_im128_300ep.log 2>&1

# --- 5. shared-stats canonical accuracy parity -------------------------------
bash tools/tpu_gate.sh
timeout 5400 $TRAIN \
    --data grf_kle512 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --shared-stats --seed 1 --no-plot --run 54 \
    > logs/sharedstats_kle512_300ep.log 2>&1

# --- 6/7. 32x32 kle100 / kle128 codec rows ----------------------------------
for KLE in 100 128; do
  bash tools/tpu_gate.sh
  timeout 5400 $TRAIN \
      --data grf_kle512 --kle $KLE --imsize 32 --ntrain 4096 --ntest 512 \
      --epochs 300 --batch-size 32 --seed 1 --no-plot --run 55 \
      > logs/codec_kle${KLE}_im32_300ep.log 2>&1
done

# --- 8. warped-GRF codec row --------------------------------------------------
bash tools/tpu_gate.sh
timeout 5400 $TRAIN \
    --data warped_grf --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --seed 1 --no-plot --run 57 \
    > logs/codec_warped_300ep.log 2>&1

echo CAMPAIGN_R4A_DONE
