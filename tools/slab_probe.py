"""A/B the dense-block impls (concat vs slab) on the real TPU.

Run (TPU must be free):  python tools/slab_probe.py [batch ...]
Times the full mixed-residual train step per impl/dtype with value-fetch
fences (block_until_ready is a no-op on axon — CLAUDE.md).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pde_surrogate_tpu.data.grf import sample_kle
from pde_surrogate_tpu.models.codec import DenseED
from pde_surrogate_tpu.utils.config import enable_compilation_cache

enable_compilation_cache()
from pde_surrogate_tpu.ops.filters import SobelFilter
from pde_surrogate_tpu.train.codec_trainer import (create_state,
                                                   make_mixed_residual_step)


def time_step(impl: str, dtype, batch: int, imsize: int = 64) -> float:
    x = jnp.asarray(sample_kle(batch, imsize, 512, rng=0)[..., None])
    model = DenseED(1, 3, imsize=imsize, blocks=[6, 8, 6], growth_rate=16,
                    init_features=48, dtype=dtype, dense_impl=impl)
    state, tx = create_state(model, jax.random.key(0), x, lr_max=1e-3,
                             total_steps=100_000)
    step = make_mixed_residual_step(model, tx, SobelFilter(imsize), 10.0)
    state, m = step(state, x)
    float(m["loss"])
    for _ in range(20):
        state, m = step(state, x)
    float(m["loss"])
    n = 100
    t0 = time.time()
    for _ in range(n):
        state, m = step(state, x)
    float(m["loss"])
    return (time.time() - t0) / n


if __name__ == "__main__":
    batches = [int(b) for b in sys.argv[1:]] or [32, 128]
    for batch in batches:
        for impl in ("concat", "slab"):
            for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
                ms = time_step(impl, dt, batch) * 1e3
                print(f"batch {batch:4d} {impl:6s} {name}: {ms:7.2f} ms/step "
                      f"({batch / ms * 1e3:.0f} samples/s)", flush=True)
