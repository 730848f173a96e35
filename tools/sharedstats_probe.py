"""A/B the shared-BN-stats dense block against the default concat impl.

The shared path (models/codec.py::DenseBlock._call_shared) computes each
feature group's batch moments ONCE at production and reuses them in every
later layer's norm, removing the per-layer full-prefix stats re-reduction
(the O(L^2) HBM term) with the same math.  Unlike the removed slab variant
(layout change; lost to XLA's concat fusion — logs/slab_probe_r3.log), this
is a pure traffic cut, but the same rule applies: measure, don't assume.

Run (TPU free):  python tools/sharedstats_probe.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pde_surrogate_tpu.data.grf import sample_kle
from pde_surrogate_tpu.models.codec import DenseED
from pde_surrogate_tpu.ops.filters import SobelFilter
from pde_surrogate_tpu.train.codec_trainer import (create_state,
                                                   make_mixed_residual_step)
from pde_surrogate_tpu.utils.config import enable_compilation_cache

enable_compilation_cache()


def timed_step(shared: bool, batch: int, dtype, n_steps: int = 100,
               concat_free: bool = False):
    imsize = 64
    x = jnp.asarray(sample_kle(batch, imsize, 512, rng=0)[..., None])
    model = DenseED(1, 3, imsize=imsize, blocks=[6, 8, 6], growth_rate=16,
                    init_features=48, dtype=dtype, shared_stats=shared,
                    concat_free=concat_free)
    state, tx = create_state(model, jax.random.key(0), x, lr_max=1e-3,
                             total_steps=100_000)
    step = make_mixed_residual_step(model, tx, SobelFilter(imsize), 10.0)
    t0 = time.time()
    state, m = step(state, x)
    loss0 = float(m["loss"])  # fence (block_until_ready is a no-op here)
    print(f"  compile {time.time() - t0:.1f}s, first loss {loss0:.4f}",
          flush=True)
    for _ in range(20):
        state, m = step(state, x)
    float(m["loss"])
    t0 = time.time()
    for _ in range(n_steps):
        state, m = step(state, x)
    loss = float(m["loss"])
    dt = (time.time() - t0) / n_steps
    return dt, loss


def equivalence_check():
    """Same params, one train step each impl on TPU: losses must agree."""
    imsize, batch = 64, 32
    x = jnp.asarray(sample_kle(batch, imsize, 512, rng=1)[..., None])
    kw = dict(blocks=[6, 8, 6], growth_rate=16, init_features=48)
    ref = DenseED(1, 3, imsize=imsize, **kw)
    shr = DenseED(1, 3, imsize=imsize, shared_stats=True, **kw)
    variables = ref.init(jax.random.key(0), x, train=False)
    sobel = SobelFilter(imsize)
    from pde_surrogate_tpu.ops.darcy import mixed_residual_loss

    from functools import partial

    @partial(jax.jit, static_argnums=0)
    def loss_of(model_shared):
        def f(m):
            y, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
            return mixed_residual_loss(x, y, sobel, 10.0)[0]
        return f(shr) if model_shared else f(ref)

    l1 = float(loss_of(False))
    l2 = float(loss_of(True))
    print(f"[equiv] loss default {l1:.6f} vs shared {l2:.6f} "
          f"(rel {abs(l1 - l2) / max(abs(l1), 1e-12):.2e})", flush=True)
    # CPU is bitwise-equal (tests/test_codec.py); on TPU the two programs
    # fuse/reduce in different orders and the squared-gradient loss
    # amplifies f32 rounding — measured rel 1.0e-4 on the first run.
    assert np.isclose(l1, l2, rtol=1e-3), "impls diverge on TPU"


def main():
    print(f"[probe] devices: {jax.devices()}", flush=True)
    equivalence_check()
    rows = []
    for label, shared, batch, dtype, cfree in [
            ("default f32/bs32", False, 32, None, False),
            ("shared  f32/bs32", True, 32, None, False),
            ("cfree   f32/bs32", True, 32, None, True),
            ("default bf16/bs128", False, 128, jnp.bfloat16, False),
            ("shared  bf16/bs128", True, 128, jnp.bfloat16, False),
            ("cfree   bf16/bs128", True, 128, jnp.bfloat16, True)]:
        print(f"[probe] {label} ...", flush=True)
        dt, loss = timed_step(shared, batch, dtype, concat_free=cfree)
        rows.append((label, dt, batch / dt, loss))
        print(f"  {dt * 1e3:.2f} ms/step = {batch / dt:.0f} samples/sec "
              f"(loss {loss:.4f})", flush=True)
    print("\n[probe] summary:", flush=True)
    for label, dt, sps, loss in rows:
        print(f"  {label}: {dt * 1e3:6.2f} ms  {sps:8.0f} s/s", flush=True)


if __name__ == "__main__":
    main()
