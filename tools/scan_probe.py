"""Bisect the scanned-epoch slowdown: time scan variants of the train step.

Variants:
  full    - the real step core (fwd + loss + bwd + adam)
  fwd     - forward + loss only (no grad/optimizer)
  noop    - gather + trivial elementwise (scan machinery floor)
  eager   - the jitted per-step loop for comparison (fenced at the end)
"""
import sys
import time

sys.path.insert(0, ".")
import functools

import jax
import jax.numpy as jnp

from pde_surrogate_tpu.data.grf import sample_kle
from pde_surrogate_tpu.models.codec import DenseED
from pde_surrogate_tpu.ops.darcy import mixed_residual_loss
from pde_surrogate_tpu.ops.filters import SobelFilter
from pde_surrogate_tpu.train.codec_trainer import (create_state,
                                                   make_mixed_residual_step)
from pde_surrogate_tpu.utils.config import enable_compilation_cache

enable_compilation_cache()
imsize, batch, steps = 64, 32, 128
xs = jnp.asarray(sample_kle(batch * steps, imsize, 512, rng=0)[..., None])
epoch = xs.reshape(steps, batch, imsize, imsize, 1)
model = DenseED(1, 3, imsize=imsize, blocks=[6, 8, 6], growth_rate=16,
                init_features=48)
state, tx = create_state(model, jax.random.key(0), xs[:4], 1e-3, 100_000)
sobel = SobelFilter(imsize)
step = make_mixed_residual_step(model, tx, sobel, 10.0)


def timed(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n / steps
    print(f"{name:8s}: {dt * 1e3:7.3f} ms/step  "
          f"({batch / dt:8.0f} samples/sec)")


@jax.jit
def scan_full(state, epoch):
    def body(st, xb):
        st, m = step.core(st, xb)
        return st, m["loss"]
    return jax.lax.scan(body, state, epoch)


@jax.jit
def scan_fwd(state, epoch):
    def body(st, xb):
        out = model.apply({"params": st.params,
                           "batch_stats": st.batch_stats}, xb, train=False)
        loss, _ = mixed_residual_loss(xb, out, sobel, 10.0)
        return st, loss
    return jax.lax.scan(body, state, epoch)


@jax.jit
def scan_noop(state, epoch):
    def body(st, xb):
        return st, xb.mean()
    return jax.lax.scan(body, state, epoch)


def eager_loop(state, epoch):
    for s in range(steps):
        state, m = step(state, epoch[s])
    return m["loss"]


timed("noop", scan_noop, state, epoch)
timed("fwd", scan_fwd, state, epoch)
timed("full", scan_full, state, epoch)
# eager donates state; rebuild
state2, _ = create_state(model, jax.random.key(0), xs[:4], 1e-3, 100_000)
loss = eager_loop(state2, epoch)  # compile
jax.block_until_ready(loss)
state3, _ = create_state(model, jax.random.key(0), xs[:4], 1e-3, 100_000)
t0 = time.time()
loss = eager_loop(state3, epoch)
jax.block_until_ready(loss)
dt = (time.time() - t0) / steps
print(f"{'eager':8s}: {dt * 1e3:7.3f} ms/step  ({batch / dt:8.0f} samples/sec)")
