"""Pallas CG win-or-retire sweep (VERDICT r4 item 6).

Honest (value-fetch-fenced) timing of the in-VMEM Pallas PCG label solver
against the XLA CG path it duplicates, on the dataset-factory workload
(kle512 + channelized accuracy guard), sweeping:
  - grid 64^2 and 128^2 at the production iteration scaling (24*n),
  - fields_per_program around the VMEM-budget autosize,
  - batch 64 (dataset-factory solve_batch default) and 256,
  - bf16 field storage (accuracy measured — expected to fail; recorded).

Decision rule (docs/DESIGN.md): if no Pallas row beats the XLA production
path by a meaningful margin (>10%), the XLA path becomes the single label
solver and the kernel is kept as a validated probe.
"""
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

enable_compilation_cache()
print(f"[sweep] devices: {jax.devices()}", flush=True)


def rel(a, b, B):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float((np.linalg.norm((a - b).reshape(B, -1), axis=1)
                  / np.linalg.norm(b.reshape(B, -1), axis=1)).max())


def timed(name, fn, arg, n_rep=5):
    t0 = time.time()
    out = fn(arg)
    np.asarray(out)  # compile + honest sync
    print(f"  {name}: compile+first {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(n_rep):
        out = fn(arg)
    np.asarray(out)
    dt = (time.time() - t0) / n_rep
    B = arg.shape[0]
    print(f"  {name}: {dt * 1e3:.1f} ms/batch{B} ({B / dt:.0f} fields/sec)",
          flush=True)
    return out, dt


for N in (64, 128):
    NI = 24 * N
    auto = _auto_fields_per_program(N)
    for B in ((64, 256) if N == 64 else (64,)):
        print(f"[sweep] n={N} batch={B} n_iter={NI} (auto fpp={auto})",
              flush=True)
        K = jnp.asarray(sample_kle(B, N, 512, rng=0))
        ref, dt_x = timed("xla tol1e-8 (production alt)",
                          lambda k: solve_darcy_batch(k)[:, 0], K)
        rows = {}
        # only blockings at or below the auto size: the r5 run measured
        # real scoped-VMEM usage at ~2x the 17-buffer estimate (fpp=32
        # at 64^2 hit 17.28 M > 16 M and the remote compile error killed
        # the process, logs/pallas_cg_sweep_r5.log) — auto is the
        # hardware-validated ceiling
        for fpp in sorted({auto, max(auto // 2, 1), max(auto // 4, 1)},
                          reverse=True):
            try:
                out, dt = timed(f"pallas fpp={fpp}",
                                lambda k, f=fpp: solve_darcy_pallas(
                                    k, n_iter=NI, fields_per_program=f), K)
            except Exception as e:  # noqa: BLE001 — keep sweeping
                print(f"  fpp={fpp}: failed ({type(e).__name__}: {e})",
                      flush=True)
                continue
            rows[fpp] = dt
            print(f"    rel err vs xla: {rel(out, ref, B):.2e}", flush=True)
        best = min(rows.items(), key=lambda kv: kv[1])
        print(f"[sweep] n={N} B={B}: best pallas fpp={best[0]} "
              f"{best[1] * 1e3:.1f} ms vs xla {dt_x * 1e3:.1f} ms -> "
              f"speedup {dt_x / best[1]:.2f}x", flush=True)

# bf16 storage probe (accuracy expected to collapse — recorded either way)
N, B = 64, 64
K = jnp.asarray(sample_kle(B, N, 512, rng=0))
ref = solve_darcy_batch(K)[:, 0]
np.asarray(ref)
try:
    out, dt = timed("pallas bf16 storage",
                    lambda k: solve_darcy_pallas(
                        k.astype(jnp.bfloat16), n_iter=24 * N), K)
    print(f"  bf16 rel err vs f32 xla: {rel(out, ref, B):.2e}", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"  bf16 storage failed: {type(e).__name__}: {e}", flush=True)

# channelized accuracy guard at the best 64^2 blocking
Kc = jnp.asarray(sample_channelized(B, N, rng=1))
refc = solve_darcy_batch(Kc)[:, 0]
outc = solve_darcy_pallas(Kc, n_iter=24 * N)
print(f"[sweep] channelized rel err (auto fpp): {rel(outc, refc, B):.2e}",
      flush=True)
print("[sweep] done", flush=True)
