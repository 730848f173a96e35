"""Bisect the cGlow scanned-epoch anomaly with HONEST fences (value fetch —
jax.block_until_ready is a no-op on the axon platform, and the original
"scan ~3.5x slower than eager" measurement predates that discovery).

Variants (kle100 32x32 reverse-KL config, the flagship flow):
  eager    - jitted per-step loop, one dispatch per batch (driver default)
  scan     - make_epoch_fn(step.core): the real scanned epoch
  scan-nc  - scan with the loop-invariant leaves (constants pytree + base
             key) closed over instead of carried, isolating carry-copy cost
  scan-fwd - generate + loss only inside scan (no grad/adam)

Optionally writes a profiler trace per variant (--trace DIR).

Run (TPU must be free):  python tools/glow_scan_probe.py [--trace /tmp/tr]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pde_surrogate_tpu.data.grf import sample_kle
from pde_surrogate_tpu.models.glow import MultiScaleCondGlow
from pde_surrogate_tpu.ops.darcy import (conv_boundary_condition,
                                         conv_constitutive_constraint,
                                         conv_continuity_constraint)
from pde_surrogate_tpu.ops.filters import SobelFilter
from pde_surrogate_tpu.train.codec_trainer import make_epoch_fn
from pde_surrogate_tpu.train.glow_trainer import (GlowState, create_glow_state,
                                                  make_reverse_kl_step)
from pde_surrogate_tpu.utils.config import enable_compilation_cache

parser = argparse.ArgumentParser()
parser.add_argument("--trace", type=str, default=None)
parser.add_argument("--steps", type=int, default=32)
parser.add_argument("--batch", type=int, default=32)
args = parser.parse_args()

enable_compilation_cache()
imsize, batch, steps = 32, args.batch, args.steps
n_pix = 3 * imsize * imsize
xs = jnp.asarray(sample_kle(batch * steps, imsize, 100, rng=0)[..., None])
epoch = xs.reshape(steps, batch, imsize, imsize, 1)
idx = jnp.arange(batch * steps, dtype=jnp.int32).reshape(steps, batch)
model = MultiScaleCondGlow(img_size=imsize, x_channels=1, y_channels=3,
                           enc_blocks=[3, 4, 4], flow_blocks=[6, 6, 6])
y0 = jnp.zeros((batch, imsize, imsize, 3))
sobel = SobelFilter(imsize)


def fresh_state():
    state, tx = create_glow_state(model, jax.random.key(0), y0, epoch[0],
                                  lr_max=1.5e-3, total_steps=100_000)
    return state, tx


state, tx = fresh_state()
step = make_reverse_kl_step(model, tx, sobel, beta=150.0, weight_bound=50.0,
                            n_out_pixels=n_pix)


def fence(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(name, fn, n=3):
    out = fn()  # compile + warmup
    fence(out)
    if args.trace:
        with jax.profiler.trace(f"{args.trace}/{name}"):
            fence(fn())
    t0 = time.time()
    for _ in range(n):
        out = fn()
    fence(out)
    dt = (time.time() - t0) / n / steps
    print(f"{name:9s}: {dt * 1e3:8.3f} ms/step ({batch / dt:7.0f} samples/s)",
          flush=True)
    return dt


# --- eager: per-batch dispatches (cannot donate: state reused across reps) --
eager_step = jax.jit(step.core)


def run_eager():
    st = state
    for s in range(steps):
        st, m = eager_step(st, epoch[s])
    return m["loss"]


# --- scan: the real scanned epoch ------------------------------------------
epoch_fn = make_epoch_fn(step.core)


def run_scan():
    st, m = jax.jit(lambda s, i, a: epoch_fn(s, i, a))(state, idx, xs)
    return m["loss"]


# --- scan-nc: constants + key OUT of the carry -----------------------------
def make_nc_epoch():
    constants, key = state.constants, state.key

    @jax.jit
    def run(st_small, idx, xs):
        ep = jnp.take(xs, idx.reshape(-1), axis=0).reshape(
            idx.shape + xs.shape[1:])

        def body(carry, xb):
            st = GlowState(carry[0], carry[1], carry[2], constants,
                           carry[3], key)
            st, m = step.core(st, xb)
            return (st.step, st.params, st.batch_stats, st.opt_state), m

        carry0 = (st_small.step, st_small.params, st_small.batch_stats,
                  st_small.opt_state)
        carry, m = jax.lax.scan(body, carry0, ep)
        return m["loss"]

    return run


nc = make_nc_epoch()


def run_scan_nc():
    return nc(state, idx, xs)


# --- scan-fwd: generate + loss only ----------------------------------------
@jax.jit
def run_scan_fwd(st, idx, xs):
    ep = jnp.take(xs, idx.reshape(-1), axis=0).reshape(idx.shape + xs.shape[1:])

    def body(c, xb):
        key = jax.random.fold_in(st.key, c)
        (out, logp), _ = model.apply(
            {"params": st.params, "batch_stats": st.batch_stats,
             "constants": st.constants}, xb, key=key, train=True,
            method=model.generate, mutable=["batch_stats"])
        residual = (conv_constitutive_constraint(xb, out, sobel)
                    + conv_continuity_constraint(out, sobel))
        diri, neum = conv_boundary_condition(out)
        loss = (residual + (diri + neum) * 50.0) * 150.0 \
            + logp.mean() / 0.6931 / n_pix
        return c + 1, loss

    _, losses = jax.lax.scan(body, jnp.zeros((), jnp.int32), ep)
    return losses


print(f"[glow_scan_probe] devices: {jax.devices()}", flush=True)
timed("eager", run_eager)
timed("scan", run_scan)
timed("scan-nc", run_scan_nc)
timed("scan-fwd", lambda: run_scan_fwd(state, idx, xs))
