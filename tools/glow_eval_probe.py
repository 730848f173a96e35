"""Measure the scanned cGlow eval epoch vs the eager per-batch loop (r4).

The round-3 driver's test() dispatched one jitted step per test batch —
8 batches x ~30 ms tunnel RTT per eval epoch, every epoch of a 400-epoch
run.  make_glow_eval_epoch_fn gathers the whole test set into one device
program.  This probe times both at the flagship kle100@32 eval shape
(512 samples, bs 64) with honest value-fetch fences.

Run (TPU free):  python tools/glow_eval_probe.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pde_surrogate_tpu.data.grf import sample_kle
from pde_surrogate_tpu.data.pipeline import DeviceDataset
from pde_surrogate_tpu.models.glow import MultiScaleCondGlow
from pde_surrogate_tpu.ops.filters import SobelFilter
from pde_surrogate_tpu.train.glow_trainer import (create_glow_state,
                                                  make_glow_eval_epoch_fn,
                                                  make_glow_eval_step)
from pde_surrogate_tpu.utils.config import enable_compilation_cache

enable_compilation_cache()


def main():
    print(f"[probe] devices: {jax.devices()}", flush=True)
    imsize, ntest, bs = 32, 512, 64
    x = np.asarray(sample_kle(ntest, imsize, 100, rng=0)[..., None],
                   np.float32)
    y = np.random.default_rng(1).standard_normal(
        (ntest, imsize, imsize, 3)).astype(np.float32)
    model = MultiScaleCondGlow(img_size=imsize, x_channels=1, y_channels=3,
                               enc_blocks=[3, 4, 4], flow_blocks=[6, 6, 6])
    state, _ = create_glow_state(model, jax.random.key(0),
                                 jnp.zeros((2, imsize, imsize, 3)),
                                 jnp.asarray(x[:2]), lr_max=1e-3,
                                 total_steps=10)
    sobel = SobelFilter(imsize)
    ev = make_glow_eval_step(model, sobel, 150.0, 50.0, 3 * imsize * imsize)
    ds = DeviceDataset(x, y, batch_size=bs, key=1, shuffle=False)
    base = jax.random.key(7)

    def eager_epoch(epoch):
        losses = []
        for i, (xb, yb) in enumerate(ds.batches(epoch)):
            out = ev(state, xb, yb, jax.random.fold_in(base,
                                                       epoch * 1000 + i))
            losses.append(out["loss"])
        return float(jnp.mean(jnp.stack(losses)))

    epoch_fn = make_glow_eval_epoch_fn(ev.core)
    idx = ds.epoch_indices(0)

    def scan_epoch(epoch):
        keys = jax.vmap(lambda d: jax.random.fold_in(base, d))(
            epoch * 1000 + jnp.arange(len(ds)))
        ms = epoch_fn(state, idx, keys, *ds.arrays)
        return float(jnp.mean(ms["loss"]))

    t0 = time.time()
    l_e = eager_epoch(0)
    print(f"[probe] eager compile+first epoch {time.time() - t0:.1f}s "
          f"loss {l_e:.4f}", flush=True)
    t0 = time.time()
    l_s = scan_epoch(0)
    print(f"[probe] scan  compile+first epoch {time.time() - t0:.1f}s "
          f"loss {l_s:.4f}", flush=True)
    assert np.isclose(l_e, l_s, rtol=1e-4), (l_e, l_s)

    n = 10
    t0 = time.time()
    for e in range(1, n + 1):
        eager_epoch(e)
    dt_e = (time.time() - t0) / n
    t0 = time.time()
    for e in range(1, n + 1):
        scan_epoch(e)
    dt_s = (time.time() - t0) / n
    print(f"[probe] eval epoch (512 samples, bs {bs}, {len(ds)} batches): "
          f"eager {dt_e * 1e3:.1f} ms vs scanned {dt_s * 1e3:.1f} ms "
          f"({dt_e / dt_s:.2f}x)", flush=True)
    print(f"[probe] per-400-epoch-run saving: "
          f"{(dt_e - dt_s) * 400:.1f} s", flush=True)


if __name__ == "__main__":
    main()
