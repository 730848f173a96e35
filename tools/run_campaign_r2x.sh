#!/bin/bash
# Campaign X (after T, before S): channelized SUPERVISED ceiling. RESULTS.md has the
# kle512 supervised-vs-label-free comparison but no channelized analog, so
# the channelized label-free row (R^2 0.77/0.78/0.46) has no measured
# ceiling separating objective-identifiability loss from model/data limits.
# One leg: codec max-likelihood on channelized, reference-canonical 200 ep.
cd /root/repo || exit 1
while [ ! -f logs/campaign_r2t.done ]; do sleep 120; done
for attempt in 1 2; do
  bash tools/tpu_gate.sh
  timeout 3600 python -m pde_surrogate_tpu.cli.train_codec_max_likelihood \
    --data channelized --ntrain 4096 --ntest 512 --epochs 200 --seed 1 \
    > logs/mle_channelized.log 2>&1 && break
  sleep 60
done
# matched-config JAX leg of the channelized torch A/B (the torch side runs
# on this host's CPU into logs/ab_torch_channelized.log): same data files,
# ntrain 512, 100 ep, bs 32 — the kle512 A/B protocol (docs/RESULTS.md)
for attempt in 1 2; do
  bash tools/tpu_gate.sh
  timeout 1800 python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
    --data channelized --ntrain 512 --ntest 512 --batch-size 32 \
    --epochs 100 --seed 1 --run 30 > logs/ab_jax_channelized.log 2>&1 && break
  sleep 60
done
echo done > logs/campaign_r2x.done
