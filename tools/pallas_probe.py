"""Honest (value-fetch-fenced) Pallas PCG vs XLA CG timing + accuracy."""
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pde_surrogate_tpu.data.grf import sample_channelized, sample_kle
from pde_surrogate_tpu.ops.kernels.cg_darcy import solve_darcy_pallas
from pde_surrogate_tpu.solvers.fd_darcy import solve_darcy_batch
from pde_surrogate_tpu.utils.config import enable_compilation_cache

enable_compilation_cache()
K = jnp.asarray(sample_kle(64, 64, 512, rng=0))
Kc = jnp.asarray(sample_channelized(64, 64, rng=1))


def timed(name, fn, arg, n=5):
    out = fn(arg)
    np.asarray(out)  # compile + honest sync
    t0 = time.time()
    for _ in range(n):
        out = fn(arg)
    np.asarray(out)
    dt = (time.time() - t0) / n
    print(f"{name}: {dt * 1e3:.1f} ms/batch64 ({64 / dt:.0f} fields/sec)",
          flush=True)
    return out


u_p = timed("pallas pcg 1536", lambda k: solve_darcy_pallas(k, n_iter=1536), K)
u_x = timed("xla cg tol1e-8  ", lambda k: solve_darcy_batch(k)[:, 0], K)
rel = lambda a, b: (np.linalg.norm((np.asarray(a) - np.asarray(b))
                                   .reshape(64, -1), axis=1)
                    / np.linalg.norm(np.asarray(b).reshape(64, -1), axis=1))
print("kle512 rel err pallas vs tol-1e-8:", rel(u_p, u_x).max(), flush=True)
u_pc = solve_darcy_pallas(Kc, n_iter=1536)
u_xc = solve_darcy_batch(Kc)[:, 0]
print("channelized rel err pallas vs tol-1e-8:", rel(u_pc, u_xc).max(),
      flush=True)
