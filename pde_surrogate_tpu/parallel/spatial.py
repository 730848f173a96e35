"""Spatial (domain-decomposition) parallelism for field computations.

The reference has no parallelism at all; for its 64x64 problems data
parallelism is the only strategy that pays (SURVEY.md section 5).  This
module is the scaling path for *resolution*: fields sharded along H over a
``('space',)`` mesh axis, with

  * stencil/finite-volume operators evaluated per-shard under `shard_map`,
  * one-row halo exchanges via `jax.lax.ppermute` (neighbor-only ICI
    traffic — no all-gathers),
  * CG dot products reduced with `jax.lax.psum`.

`solve_darcy_spatial` is a fully sharded conjugate-gradient Darcy solve:
every iteration touches only local rows plus two halo rows, so the
communication volume per iteration is O(W) regardless of H.  Validated
against the single-device solver on the fake 8-device CPU mesh
(tests/test_spatial_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["solve_darcy_spatial", "spatial_mesh"]


def spatial_mesh(n_devices: int | None = None, axis: str = "space") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def _halo_rows(v_local: jax.Array, axis: str):
    """Exchange boundary rows with mesh neighbors.

    Arrays are (..., rows, W); the row axis is -2.  Returns (row_above,
    row_below) for this shard: the last local row of the neighbor above and
    the first local row of the neighbor below.  The ppermute ring is
    CIRCULAR, so the global edge shards receive the OPPOSITE edge of the
    domain — callers MUST multiply the halo by a coefficient that is zero
    at the global boundary (the zero top/bottom boundary-face
    conductivities here).  Do not reuse for unmasked quantities: that would
    silently couple the top and bottom boundaries.
    """
    n_dev = jax.lax.axis_size(axis)
    down = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    up = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    # send my last row downward -> becomes neighbor's "row above"
    row_above = jax.lax.ppermute(v_local[..., -1:, :], axis, perm=down)
    # send my first row upward -> becomes neighbor's "row below"
    row_below = jax.lax.ppermute(v_local[..., :1, :], axis, perm=up)
    return row_above, row_below


def solve_darcy_spatial(K: jax.Array, mesh: Mesh, axis: str = "space",
                        n_iter: int = 2000) -> jax.Array:
    """Darcy pressure solve with the H dimension sharded over ``mesh``.

    K: (n, n) or batched (..., n, n) nodal permeability (replicated or
    sharded input; output is sharded over the row dimension).  For batched
    input every field in the batch is solved simultaneously — the CG scalars
    (alpha/beta) are per-field, so convergence matches per-field solves.
    Fixed-iteration Jacobi-preconditioned CG; the matvec does one up/down
    halo exchange, the dot products one psum.
    """
    n = K.shape[-1]
    n_dev = mesh.shape[axis]
    if K.shape[-2] % n_dev:
        raise ValueError(f"H={K.shape[-2]} not divisible by mesh axis "
                         f"{n_dev}")
    nbatch = K.ndim - 2

    spec = P(*((None,) * nbatch), axis, None)
    K = jax.device_put(K, NamedSharding(mesh, spec))

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=spec, out_specs=spec)
    def solve(K_local):
        my = jax.lax.axis_index(axis)
        harm = lambda a, b: 2.0 * a * b / (a + b)
        # neighbor K rows for cross-shard faces
        k_above, k_below = _halo_rows(K_local, axis)
        k_up = jnp.concatenate([k_above, K_local[..., :-1, :]], axis=-2)
        k_dn = jnp.concatenate([K_local[..., 1:, :], k_below], axis=-2)
        kN = harm(K_local, k_up)
        kS = harm(K_local, k_dn)
        kE = jnp.zeros_like(K_local).at[..., :, :-1].set(
            harm(K_local[..., :, :-1], K_local[..., :, 1:]))
        kW = jnp.zeros_like(K_local).at[..., :, 1:].set(
            harm(K_local[..., :, 1:], K_local[..., :, :-1]))
        # global-domain walls: zero flux through top/bottom
        rows_local = K_local.shape[-2]
        grow = my * rows_local + jnp.arange(rows_local)[:, None]
        kN = jnp.where(grow == 0, 0.0, kN)
        kS = jnp.where(grow == n - 1, 0.0, kS)
        col = jnp.arange(n)[None, :]
        mask = jnp.where((col == 0) | (col == n - 1), 0.0,
                         1.0).astype(K_local.dtype) * jnp.ones_like(K_local)

        diag = kE + kW + kN + kS
        inv_diag = mask / jnp.maximum(diag, 1e-30)

        def matvec(v):
            above, below = _halo_rows(v, axis)
            v_up = jnp.concatenate([above, v[..., :-1, :]], axis=-2)
            v_dn = jnp.concatenate([v[..., 1:, :], below], axis=-2)
            vE = jnp.zeros_like(v).at[..., :, :-1].set(v[..., :, 1:])
            vW = jnp.zeros_like(v).at[..., :, 1:].set(v[..., :, :-1])
            lap = (kE * (vE - v) + kW * (vW - v) + kN * (v_up - v)
                   + kS * (v_dn - v))
            return -lap * mask

        def dot(a, b):
            # per-field CG scalars: reduce over the local rows+cols only,
            # then over the mesh; batch dims stay
            s = jnp.sum(a * b, axis=(-2, -1), keepdims=True)
            return jax.lax.psum(s, axis)

        b = jnp.zeros_like(K_local).at[..., :, 1].set(kW[..., :, 1])
        v = jnp.zeros_like(K_local)
        r = b
        z = r * inv_diag
        p = z
        rz = dot(r, z)

        def body(_, carry):
            v, r, p, rz = carry
            ap = matvec(p)
            alpha = rz / (dot(p, ap) + 1e-30)
            v = v + alpha * p
            r = r - alpha * ap
            z = r * inv_diag
            rz_new = dot(r, z)
            beta = rz_new / (rz + 1e-30)
            p = z + beta * p
            return v, r, p, rz_new

        v, _, _, _ = jax.lax.fori_loop(0, n_iter, body, (v, r, p, rz))
        u_d = jnp.zeros_like(K_local).at[..., :, 0].set(1.0)
        return u_d + v * mask

    return solve(K)
