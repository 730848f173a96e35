"""Bisect the fvcg TPU compile stall (campaign D, 2026-08-19).

The fvcg channelized leg printed "Start training" and then nothing for
30+ min — either the scanned-epoch executable's remote compile is
pathologically slow or the backend hung.  This probe compiles, in order,
with wall-clock prints between each: (1) the fvcg loss+grad alone,
(2) the full train STEP (fwd+bwd+Adam), (3) the scanned EPOCH program
(the thing the driver waits on).  Run under `timeout` so a hang is
distinguishable from slow-but-finite.

Run (TPU free):  timeout 1200 python tools/fvcg_compile_probe.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pde_surrogate_tpu.data.grf import sample_kle
from pde_surrogate_tpu.models.codec import DenseED
from pde_surrogate_tpu.train.codec_trainer import (create_state,
                                                   make_epoch_fn,
                                                   make_mixed_residual_step)
from pde_surrogate_tpu.utils.config import enable_compilation_cache

enable_compilation_cache()
print(f"[probe] devices: {jax.devices()}", flush=True)

imsize, batch, steps = 64, 32, 8
x = jnp.asarray(sample_kle(batch, imsize, 512, rng=0)[..., None])
model = DenseED(1, 3, imsize=imsize, blocks=[6, 8, 6], growth_rate=16,
                init_features=48)
state, tx = create_state(model, jax.random.key(0), x, lr_max=1e-3,
                         total_steps=100_000)

# (1) loss + grad of fvcg alone (no model)
from pde_surrogate_tpu.ops.darcy import fv_cg_error_loss
y = jnp.zeros((batch, imsize, imsize, 3))
t0 = time.time()
g = jax.jit(jax.grad(lambda yy: fv_cg_error_loss(x, yy)[0]))(y)
print(f"[probe] fvcg loss+grad alone: {time.time() - t0:.1f}s "
      f"(|g| {float(jnp.abs(g).sum()):.3e})", flush=True)

# (2) full train step
step = make_mixed_residual_step(model, tx, None, 10.0, physics="fvcg")
t0 = time.time()
state2, m = step(state, x)
print(f"[probe] fvcg STEP compile+run: {time.time() - t0:.1f}s "
      f"(loss {float(m['loss']):.4f})", flush=True)

# (3) scanned epoch (the driver's program).  NOTE: step donated its input
# state, so reuse state2 (the returned one), not the deleted original.
xs = jnp.asarray(sample_kle(batch * steps, imsize, 512, rng=1)[..., None])
idx = jnp.arange(batch * steps, dtype=jnp.int32).reshape(steps, batch)
epoch_fn = make_epoch_fn(step.core)
t0 = time.time()
state3, em = epoch_fn(state2, idx, xs)
print(f"[probe] fvcg EPOCH({steps} steps) compile+run: "
      f"{time.time() - t0:.1f}s (loss {float(jnp.mean(em['loss'])):.4f})",
      flush=True)
print("[probe] done", flush=True)
