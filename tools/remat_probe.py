"""Remat probe (VERDICT r4 item 7): does per-dense-block activation
rematerialization (DenseED(remat=True), jax.checkpoint under the hood) buy
step time on the HBM-bound canonical configs?

Measures the mixed-residual train step (honest value-fetch fences) at
  - f32 / bs32 (the canonical, baseline-comparable config), and
  - bf16 / bs128 (the throughput mode sitting at roofline ratio 0.99),
with remat off (production default) and on.  The trade: the backward pass
re-computes each block's activations from its input instead of streaming
them from HBM — less activation traffic, more FLOPs; on a bandwidth-bound
step that can go either way, and it is the one bandwidth lever not yet
probed after the slab and concat-free layouts both lost
(docs/RESULTS.md throughput section).
"""
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pde_surrogate_tpu.data.grf import sample_kle
from pde_surrogate_tpu.models.codec import DenseED
from pde_surrogate_tpu.ops.filters import SobelFilter
from pde_surrogate_tpu.train.codec_trainer import (create_state,
                                                   make_mixed_residual_step)
from pde_surrogate_tpu.utils.config import enable_compilation_cache

enable_compilation_cache()
IMSIZE = 64
print(f"[remat] devices: {jax.devices()}", flush=True)


def measure(batch, dtype, remat, n_steps=60):
    x = jnp.asarray(sample_kle(batch, IMSIZE, 512, rng=0)[..., None])
    model = DenseED(1, 3, imsize=IMSIZE, blocks=[6, 8, 6], growth_rate=16,
                    init_features=48, dtype=dtype, shared_stats=True,
                    remat=remat)
    state, tx = create_state(model, jax.random.key(0), x, lr_max=1e-3,
                             total_steps=100_000)
    step = make_mixed_residual_step(model, tx, SobelFilter(IMSIZE), 10.0)
    t0 = time.time()
    state, m = step(state, x)
    float(m["loss"])
    print(f"  compile+first: {time.time() - t0:.1f}s", flush=True)
    for _ in range(10):
        state, m = step(state, x)
    float(m["loss"])
    t0 = time.time()
    for _ in range(n_steps):
        state, m = step(state, x)
    loss = float(m["loss"])  # fence
    dt = (time.time() - t0) / n_steps
    print(f"  bs{batch} {'bf16' if dtype else 'f32'} remat={remat}: "
          f"{dt * 1e3:.2f} ms/step ({batch / dt:.0f} samples/sec), "
          f"loss {loss:.4f}", flush=True)
    return dt


for batch, dtype in ((32, None), (128, jnp.bfloat16)):
    base = measure(batch, dtype, remat=False)
    rem = measure(batch, dtype, remat=True)
    print(f"[remat] bs{batch} {'bf16' if dtype else 'f32'}: "
          f"{base * 1e3:.2f} -> {rem * 1e3:.2f} ms/step "
          f"({'WIN' if rem < base else 'loss'} {base / rem:.3f}x)",
          flush=True)
print("[remat] done", flush=True)
