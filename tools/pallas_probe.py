"""Honest (value-fetch-fenced) Pallas PCG vs XLA CG timing + accuracy.

--n / --batch select the grid / batch size (default 64/64, the production
shape); --n 128 validates the autosized fields_per_program VMEM blocking
(cg_darcy._auto_fields_per_program) on real hardware.
"""
import argparse
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pde_surrogate_tpu.data.grf import sample_channelized, sample_kle
from pde_surrogate_tpu.ops.kernels.cg_darcy import (_auto_fields_per_program,
                                                    solve_darcy_pallas)
from pde_surrogate_tpu.solvers.fd_darcy import solve_darcy_batch
from pde_surrogate_tpu.utils.config import enable_compilation_cache

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=64)
parser.add_argument("--batch", type=int, default=64)
args = parser.parse_args()
N, B = args.n, args.batch
N_ITER = 24 * N  # production iteration scaling (CLAUDE.md numerics)

enable_compilation_cache()
K = jnp.asarray(sample_kle(B, N, 512, rng=0))
Kc = jnp.asarray(sample_channelized(B, N, rng=1))
print(f"[pallas_probe] n={N} batch={B} n_iter={N_ITER} "
      f"fields/program={_auto_fields_per_program(N)}", flush=True)


def timed(name, fn, arg, n=5):
    out = fn(arg)
    np.asarray(out)  # compile + honest sync
    t0 = time.time()
    for _ in range(n):
        out = fn(arg)
    np.asarray(out)
    dt = (time.time() - t0) / n
    print(f"{name}: {dt * 1e3:.1f} ms/batch{B} ({B / dt:.0f} fields/sec)",
          flush=True)
    return out


u_p = timed(f"pallas pcg {N_ITER}",
            lambda k: solve_darcy_pallas(k, n_iter=N_ITER), K)
u_x = timed("xla cg tol1e-8  ", lambda k: solve_darcy_batch(k)[:, 0], K)
rel = lambda a, b: (np.linalg.norm((np.asarray(a) - np.asarray(b))
                                   .reshape(B, -1), axis=1)
                    / np.linalg.norm(np.asarray(b).reshape(B, -1), axis=1))
print("kle512 rel err pallas vs tol-1e-8:", rel(u_p, u_x).max(), flush=True)
u_pc = solve_darcy_pallas(Kc, n_iter=N_ITER)
u_xc = solve_darcy_batch(Kc)[:, 0]
print("channelized rel err pallas vs tol-1e-8:", rel(u_pc, u_xc).max(),
      flush=True)
