"""Resolution-scaling probe: solve_darcy_spatial at large grids on the
8-device virtual CPU mesh, with correctness vs the single-device solver
(VERDICT r2 item 4).

The virtual devices share one physical core, so wall-clock here measures
mechanics (the sharded CG compiles + runs and its halo/psum pattern is
correct at scale), not speedup; the per-iteration communication volume is
the quantity that scales (O(W) per halo exchange regardless of H).

Run:  python tools/spatial_scale_probe.py [--sizes 256,512] [--batch 1]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

from pde_surrogate_tpu.data.grf import sample_kle
from pde_surrogate_tpu.parallel.spatial import solve_darcy_spatial, spatial_mesh
from pde_surrogate_tpu.solvers.fd_darcy import solve_darcy

parser = argparse.ArgumentParser()
parser.add_argument("--sizes", type=str, default="256,512")
parser.add_argument("--batch", type=int, default=1)
parser.add_argument("--kle", type=int, default=512)
args = parser.parse_args()

mesh = spatial_mesh(8)
print(f"[spatial_scale_probe] devices: {len(jax.devices())} "
      f"({jax.devices()[0].platform})", flush=True)

for n in [int(s) for s in args.sizes.split(",")]:
    K = jnp.asarray(sample_kle(args.batch, n, args.kle, rng=0))
    if args.batch == 1:
        K = K[0]
    n_iter = 24 * n  # CG iteration count scales with grid size

    t0 = time.time()
    u_sp = solve_darcy_spatial(K, mesh, n_iter=n_iter)
    u_sp_np = np.asarray(u_sp)  # honest fence: value fetch
    t_sp = time.time() - t0

    t0 = time.time()
    u_ref = np.asarray(solve_darcy(K if K.ndim == 2 else K[0],
                                   maxiter=n_iter))
    t_ref = time.time() - t0

    a = u_sp_np if u_sp_np.ndim == 2 else u_sp_np[0]
    rel = np.linalg.norm(a - u_ref) / np.linalg.norm(u_ref)
    print(f"n={n:5d} batch={args.batch} iters={n_iter}: "
          f"sharded {t_sp:7.1f}s  single-dev {t_ref:7.1f}s  "
          f"rel-L2 vs single-dev {rel:.2e}  "
          f"shards {len(u_sp.sharding.device_set)}", flush=True)
