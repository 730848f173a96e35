#!/bin/bash
# Round-3 campaign H (waits for campaign G): the reference's canonical
# probabilistic config — cGlow kle100@32, beta 150, 400 epochs (README.md:66,
# our driver defaults reproduce it exactly) — plus its full UQ suite, and a
# profiler-trace op-share table for the glow step (the codec step has one;
# the flow is the second-most-expensive model).
# Launch:
#   nohup bash tools/run_campaign_r3h.sh > logs/campaign_r3h.log 2>&1 &
set -x
cd "$(dirname "$0")/.." || exit 1
PY=python

while ! grep -q CAMPAIGN_R3G_DONE logs/campaign_r3g.log 2>/dev/null; do
  sleep 120
done

# --- 1. cGlow kle100@32 canonical 400ep ------------------------------------
bash tools/tpu_gate.sh
timeout 10800 $PY -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
    --epochs 400 --ckpt-freq 100 \
    > logs/cglow_kle100_im32_400ep.log 2>&1

# --- 2. UQ suite on it -------------------------------------------------------
RUN=$(ls -d experiments/cglow/reverse_kld/kle100_* 2>/dev/null | head -1)
if [ -n "$RUN" ]; then
  bash tools/tpu_gate.sh
  timeout 7200 $PY -m pde_surrogate_tpu.cli.post_cglow --run-dir "$RUN" \
      > logs/post_cglow_kle100_r3.log 2>&1
fi

# --- 3. glow step trace op shares -------------------------------------------
bash tools/tpu_gate.sh
rm -rf experiments/glow_trace
timeout 3600 $PY tools/glow_scan_probe.py --trace experiments/glow_trace \
    > logs/glow_trace_r3.log 2>&1
for d in experiments/glow_trace/*/; do
  echo "== $d" >> logs/glow_trace_r3.log
  $PY tools/trace_op_shares.py "$d" >> logs/glow_trace_r3.log 2>&1
done

echo CAMPAIGN_R3H_DONE
