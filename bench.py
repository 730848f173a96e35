"""Benchmark: codec mixed-residual training throughput on one TPU chip.

The north-star config (BASELINE.md): DenseED blocks [6,8,6], K=16, init 48
(740k params), 64x64 grf_kle512 inputs, batch 32, label-free mixed-residual
loss — the hot loop of train_codec_mixed_residual.py in the reference.

Prints ONE JSON line:
  {"metric": ..., "value": samples/sec/chip, "unit": ..., "vs_baseline": r}

vs_baseline is measured against the PyTorch-CPU reference implementation
executing the identical training step on this container's CPU
(measured 2026-08-16 on this image: 3789 ms/step for batch 32 with the
reference's DenseED + Sobel losses + Adam => 8.44 samples/sec; see
BASELINE.md "north-star": the target is vs_baseline >= 10).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from pde_surrogate_tpu.data.grf import sample_kle  # noqa: E402
from pde_surrogate_tpu.models.codec import DenseED  # noqa: E402
from pde_surrogate_tpu.ops.filters import SobelFilter  # noqa: E402
from pde_surrogate_tpu.train.codec_trainer import (  # noqa: E402
    create_state, make_mixed_residual_step)

TORCH_CPU_SAMPLES_PER_SEC = 8.44  # measured reference baseline (see docstring)


def main():
    imsize, batch = 64, 32
    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)

    x = jnp.asarray(sample_kle(batch, imsize, 512, rng=0)[..., None])
    model = DenseED(1, 3, imsize=imsize, blocks=[6, 8, 6], growth_rate=16,
                    init_features=48)
    state, tx = create_state(model, jax.random.key(0), x, lr_max=1e-3,
                             total_steps=100_000)
    step = make_mixed_residual_step(model, tx, SobelFilter(imsize), 10.0)

    # compile + warmup
    t0 = time.time()
    state, metrics = step(state, x)
    jax.block_until_ready(metrics["loss"])
    print(f"[bench] compile+first step: {time.time() - t0:.1f}s",
          file=sys.stderr)
    for _ in range(20):
        state, metrics = step(state, x)
    jax.block_until_ready(metrics["loss"])

    # timed
    n_steps = 100
    t0 = time.time()
    for _ in range(n_steps):
        state, metrics = step(state, x)
    jax.block_until_ready(metrics["loss"])
    dt = (time.time() - t0) / n_steps
    sps = batch / dt
    print(f"[bench] {dt * 1e3:.2f} ms/step, {sps:.1f} samples/sec, "
          f"loss {float(metrics['loss']):.4f}", file=sys.stderr)

    print(json.dumps({
        "metric": "codec_mixed_residual_train_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/sec",
        "vs_baseline": round(sps / TORCH_CPU_SAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
