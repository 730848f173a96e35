#!/bin/bash
# Round-4 campaign C (waits for campaign B): the remaining BASELINE.md:41
# family x size matrix cells — "GRF-KLE, warped GRF, channelized @ 32x32
# and 64x64" — plus the warped-GRF single-instance solver row.
#  1. channelized @32 codec canonical (300ep, 3x3, wb10)
#  2. warped-GRF @32 codec canonical
#  3. warped-GRF solver row: solve_conv --data warped_grf --idx 8
# Launch:
#   nohup bash tools/run_campaign_r4c.sh > logs/campaign_r4c.log 2>&1 &
#   echo $! > /tmp/r4c.pid
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python
TRAIN="$PY -m pde_surrogate_tpu.cli.train_codec_mixed_residual"

while ! grep -q CAMPAIGN_R4B_DONE logs/campaign_r4b.log 2>/dev/null; do
  sleep 120
done

# 0. campaign H's post_cglow leg crashed on the 160-sample MC file the
# torch-UQ probe created (the ensure_dataset guard refused to regenerate
# at a new size, by design). The probe's jax-uq phase is long finished by
# the time campaigns A+B complete; regenerate the full 10k MC set and
# re-run the kle100@32 UQ suite.
rm -f datasets/32x32/kle100_lhs10000_monte_carlo.hdf5
RUN=$(ls -d experiments/cglow/reverse_kld/kle100_* 2>/dev/null | head -1)
if [ -n "$RUN" ]; then
  bash tools/tpu_gate.sh
  timeout 7200 $PY -m pde_surrogate_tpu.cli.post_cglow --run-dir "$RUN" \
      > logs/post_cglow_kle100_r4.log 2>&1
fi

bash tools/tpu_gate.sh
timeout 5400 $TRAIN \
    --data channelized --imsize 32 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --seed 1 --no-plot --run 58 \
    > logs/codec_channelized_im32_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 5400 $TRAIN \
    --data warped_grf --imsize 32 --ntrain 4096 --ntest 512 --epochs 300 \
    --batch-size 32 --seed 1 --no-plot --run 59 \
    > logs/codec_warped_im32_300ep.log 2>&1

bash tools/tpu_gate.sh
timeout 3600 $PY -m pde_surrogate_tpu.cli.solve_conv_mixed_residual \
    --data warped_grf --idx 8 --no-plot \
    > logs/solve_conv_warped_r4.log 2>&1

echo CAMPAIGN_R4C_DONE
