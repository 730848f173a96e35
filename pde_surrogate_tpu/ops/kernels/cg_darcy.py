"""Pallas TPU kernel: complete preconditioned-CG Darcy solves in VMEM.

The data factory (solvers/fd_darcy.py) solves tens of thousands of 64x64
Darcy problems.  The XLA path iterates a while_loop over HBM-resident
batched arrays — every CG iteration streams the whole batch through HBM.
This kernel runs the *entire* solve on-chip: face conductivities, Jacobi
preconditioner, RHS assembly, and a fixed-iteration PCG loop all live in
VMEM; HBM sees exactly one read of K and one write of u per field.

Layout trick: ``F`` fields are stacked vertically into one 2-D
``(F*n, n)`` array.  Sublane (row) rolls cross field boundaries, but the
crossing values are multiplied by the zero top/bottom boundary-face
conductivities, so fields stay exactly independent with no masking of the
shifts.  Per-field CG coefficients are computed with tiny MXU matmuls
against block-indicator matrices (per-field sums and their broadcast back),
which keeps every tensor in a Mosaic-friendly >=2-D layout and amortizes the
reduction latency across all F fields.

Verified bit-close (<2e-6) against the XLA solver in
tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["solve_darcy_pallas"]


def _cg_kernel(k_ref, ind_ref, u_ref, *, n_iter: int, n: int, f: int):
    K = k_ref[:]                 # (f*n, n)
    ind = ind_ref[:]             # (f, f*n) block indicator
    dt = K.dtype

    harm = lambda a, b: 2.0 * a * b / (a + b)
    kE = harm(K, jnp.roll(K, -1, axis=1))
    kW = harm(K, jnp.roll(K, 1, axis=1))
    kS = harm(K, jnp.roll(K, -1, axis=0))
    kN = harm(K, jnp.roll(K, 1, axis=0))
    col = jax.lax.broadcasted_iota(jnp.int32, K.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, K.shape, 0) % n
    kE = jnp.where(col == n - 1, 0.0, kE)
    kW = jnp.where(col == 0, 0.0, kW)
    kS = jnp.where(row == n - 1, 0.0, kS)   # each field's bottom row
    kN = jnp.where(row == 0, 0.0, kN)       # each field's top row
    mask = jnp.where((col == 0) | (col == n - 1), 0.0, 1.0).astype(dt)

    diag = kE + kW + kN + kS
    inv_diag = mask / jnp.maximum(diag, 1e-30)

    def matvec(v):
        vE = jnp.roll(v, -1, axis=1)
        vW = jnp.roll(v, 1, axis=1)
        vS = jnp.roll(v, -1, axis=0)
        vN = jnp.roll(v, 1, axis=0)
        lap = (kE * (vE - v) + kW * (vW - v) + kN * (vN - v) + kS * (vS - v))
        return -lap * mask

    ones_cols = jnp.ones((n, n), dt)

    def field_sum_bcast(a):
        """Per-field total of ``a`` broadcast back to (f*n, n) — two MXU
        matmuls: rows-by-block then columns."""
        s = jnp.dot(ind, a, preferred_element_type=jnp.float32)     # (f, n)
        t = jnp.dot(s, ones_cols, preferred_element_type=jnp.float32)  # (f, n) totals in every col
        return jnp.dot(ind.T, t, preferred_element_type=jnp.float32)  # (f*n, n)

    b = jnp.where(col == 1, kW, 0.0).astype(dt)

    v0 = jnp.zeros_like(K)
    r0 = b
    z0 = r0 * inv_diag
    p0 = z0
    rz0 = field_sum_bcast(r0 * z0)

    def body(_, carry):
        v, r, p, rz = carry
        ap = matvec(p)
        alpha = rz / (field_sum_bcast(p * ap) + 1e-30)
        v = v + alpha * p
        r = r - alpha * ap
        z = r * inv_diag
        rz_new = field_sum_bcast(r * z)
        beta = rz_new / (rz + 1e-30)
        p = z + beta * p
        return v, r, p, rz_new

    v, _, _, _ = jax.lax.fori_loop(0, n_iter, body, (v0, r0, p0, rz0))
    u_d = jnp.where(col == 0, 1.0, 0.0).astype(dt)
    u_ref[:] = u_d + v * mask


def _auto_fields_per_program(n: int) -> int:
    """Largest power-of-two field count whose ~17 live (f*n, n) f32 buffers
    (K, 4 face conductivities, diag/inv_diag/mask, b, the 4 CG carries, ap/z
    and rounding slack) fit the 16 MB scoped-VMEM budget with headroom.
    16 at n<=64 (4.3 MB est), 8 at n=128 (8.9 MB), 2 at n=256; 16-at-128
    measurably exceeded the limit by 1.05 MB on v5e
    (logs/canon_kle512_im128_300ep.log).
    """
    budget = 12 * 2 ** 20
    f = 16
    while f > 1 and 17 * f * n * n * 4 > budget:
        f //= 2
    return f


@functools.partial(jax.jit, static_argnames=("n_iter", "fields_per_program",
                                             "interpret"))
def solve_darcy_pallas(K_batch: jax.Array, n_iter: int = 1536,
                       fields_per_program: int | None = None,
                       interpret: bool = False) -> jax.Array:
    """Solve (B, n, n) permeabilities -> (B, n, n) pressures, in-VMEM PCG."""
    bsz, n, _ = K_batch.shape
    if fields_per_program is None:
        fields_per_program = _auto_fields_per_program(n)
    f = min(fields_per_program, bsz)
    pad = (-bsz) % f
    if pad:
        K_batch = jnp.concatenate(
            [K_batch, jnp.ones((pad, n, n), K_batch.dtype)], axis=0)
    nb = K_batch.shape[0]
    flat = K_batch.reshape(nb * n, n)   # 2-D: rows are (program, field, row)

    ind = np.zeros((f, f * n), dtype=np.float32)
    for j in range(f):
        ind[j, j * n:(j + 1) * n] = 1.0
    ind = jnp.asarray(ind)

    kernel = functools.partial(_cg_kernel, n_iter=n_iter, n=n, f=f)
    out = pl.pallas_call(
        kernel,
        grid=(nb // f,),
        in_specs=[
            pl.BlockSpec((f * n, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, f * n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f * n, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * n, n), K_batch.dtype),
        interpret=interpret,
    )(flat, ind)
    return out.reshape(nb, n, n)[:bsz]