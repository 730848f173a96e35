"""Batched finite-volume Darcy solvers in pure JAX.

Replaces the reference's out-of-process FEniCS oracle (utils/fenics.py:13-91)
with an in-framework, jit/vmap-able solver, and doubles as the labeled-data
factory: the reference downloads FEniCS-solved datasets
(scripts/download_datasets.sh), while this framework *generates* them on
device — thousands of permeability samples solved in parallel with one vmap.

Problem (solve_conv_mixed_residual.py:3-8):

    div(K(s) grad u(s)) = 0        on (0,1)^2
    u = 1 at x=0,  u = 0 at x=1,   zero vertical flux at y in {0,1}

Discretization: node-centered 5-point finite volumes on an n x n grid
(h = 1/(n-1)), harmonic-mean face conductivities, zero-flux top/bottom via
mirror faces.  Dirichlet columns are eliminated so the operator is SPD and
conjugate gradients applies; the matvec is a stencil (rolls + elementwise),
which XLA fuses into a few VPU passes — no sparse matrices anywhere.

The nonlinear law (models/darcy.py:179-191)

    -K grad u = sigma + alpha1 sqrt(K) sigma^2 + alpha2 K sigma^3

is solved by Newton on the primal unknown with the Jacobian applied
matrix-free through `jax.jvp` and inner CG solves — the whole Newton loop is
one jitted computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["solve_darcy", "solve_darcy_batch", "solve_nonlinear_darcy",
           "darcy_fields"]


def _harm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Harmonic mean — THE face-conductivity convention everywhere."""
    return 2.0 * a * b / (a + b)


def _face_conductivities(K: jax.Array):
    """Harmonic-mean conductivities on east/west/north/south faces.

    K: (n, n) nodal permeability, rows = y, cols = x.
    Returns (aE, aW, aN, aS) with zero entries where the face leaves the
    domain (top/bottom => built-in zero Neumann flux).
    """
    aE = jnp.zeros_like(K).at[:, :-1].set(_harm(K[:, :-1], K[:, 1:]))
    aW = jnp.zeros_like(K).at[:, 1:].set(_harm(K[:, 1:], K[:, :-1]))
    aS = jnp.zeros_like(K).at[:-1, :].set(_harm(K[:-1, :], K[1:, :]))
    aN = jnp.zeros_like(K).at[1:, :].set(_harm(K[1:, :], K[:-1, :]))
    return aE, aW, aN, aS


def _faces_to_nodes(fx: jax.Array, fy: jax.Array):
    """Average face fluxes to nodes; zero vertical flux on top/bottom walls.

    The load-bearing label convention (CLAUDE.md): conservative face fluxes
    averaged to nodes, one-sided (edge-replicated) at the domain boundary,
    exact Neumann values on the horizontal walls.  Shared by the linear
    (darcy_fields) and nonlinear (solve_nonlinear_darcy) label paths so the
    convention cannot diverge.
    """
    pad = lambda a, w: jnp.pad(a, ((0, 0),) * (a.ndim - 2) + w, mode="edge")
    sigma1 = (pad(fx, ((0, 0), (0, 1))) + pad(fx, ((0, 0), (1, 0)))) / 2.0
    sigma2 = (pad(fy, ((0, 1), (0, 0))) + pad(fy, ((1, 0), (0, 0)))) / 2.0
    sigma2 = sigma2.at[..., 0, :].set(0.0).at[..., -1, :].set(0.0)
    return sigma1, sigma2


def _apply_operator(v: jax.Array, faces) -> jax.Array:
    """A v for the 5-point operator, v zero on the Dirichlet columns.

    Returns -div(K grad v) * h^2 restricted to the interior columns
    (the Dirichlet columns of the result are forced to v, i.e. identity,
    keeping the operator SPD on the constrained subspace).
    """
    aE, aW, aN, aS = faces
    vE = jnp.zeros_like(v).at[:, :-1].set(v[:, 1:])
    vW = jnp.zeros_like(v).at[:, 1:].set(v[:, :-1])
    vS = jnp.zeros_like(v).at[:-1, :].set(v[1:, :])
    vN = jnp.zeros_like(v).at[1:, :].set(v[:-1, :])
    lap = (aE * (vE - v) + aW * (vW - v) + aN * (vN - v) + aS * (vS - v))
    out = -lap
    # Dirichlet columns: identity rows
    out = out.at[:, 0].set(v[:, 0])
    out = out.at[:, -1].set(v[:, -1])
    return out


def _interior_mask(n: int) -> jax.Array:
    m = jnp.ones((n, n))
    return m.at[:, 0].set(0.0).at[:, -1].set(0.0)


def solve_darcy(K: jax.Array, tol: float = 1e-8, maxiter: int = 4000) -> jax.Array:
    """Pressure field u (n, n) for permeability K (n, n), linear Darcy law.

    Jacobi-preconditioned CG on the eliminated-Dirichlet system; fully
    jittable and vmap-able.

    Honesty note on ``tol``: in f32 (the framework default) a relative
    residual of 1e-8 is below the rounding floor (measured ~6.5e-6 at 64x64,
    kle512 AND channelized), so the stopping test never fires and the solve
    runs ``maxiter`` iterations — converging to the f32 floor by ~400 of
    them (the iterates are bitwise stationary after that).  That is the
    maximally accurate f32 answer; the extra iterations cost ~8 ms per
    64x64 field on one CPU core and nothing on the TPU fast path (which
    uses the fixed-iteration Pallas kernel instead).
    """
    n = K.shape[-1]
    faces = _face_conductivities(K)
    aE, aW, aN, aS = faces
    mask = _interior_mask(n)

    # boundary lift: u_d = 1 on left column, 0 elsewhere
    u_d = jnp.zeros((n, n), K.dtype).at[:, 0].set(1.0)
    # rhs = -A u_d on the interior (Dirichlet columns of rhs = 0 so the CG
    # iterates stay in the constrained subspace)
    b = -(_apply_operator(u_d, faces)) * mask

    diag = aE + aW + aN + aS
    inv_diag = mask / jnp.maximum(diag, 1e-30) + (1.0 - mask)

    def matvec(v):
        return _apply_operator(v * mask, faces) * mask + v * (1.0 - mask)

    def precond(v):
        return v * inv_diag

    v, _ = jax.scipy.sparse.linalg.cg(matvec, b, tol=tol, maxiter=maxiter,
                                      M=precond)
    return u_d + v * mask


def _grad_fd(u: jax.Array, axis: int, h: float) -> jax.Array:
    """Second-order FD gradient (central interior, one-sided boundary)."""
    u = jnp.moveaxis(u, axis, -1)
    interior = (u[..., 2:] - u[..., :-2]) / (2 * h)
    first = (-3 * u[..., 0] + 4 * u[..., 1] - u[..., 2]) / (2 * h)
    last = (3 * u[..., -1] - 4 * u[..., -2] + u[..., -3]) / (2 * h)
    g = jnp.concatenate([first[..., None], interior, last[..., None]], axis=-1)
    return jnp.moveaxis(g, -1, axis)


def darcy_fields(K: jax.Array, u: jax.Array) -> jax.Array:
    """Stack (u, sigma1, sigma2) = (pressure, horizontal flux, vertical
    flux), (3, n, n) — dataset channel layout (solve_conv_mixed_residual.py:98).

    Fluxes are **conservative face fluxes averaged to nodes**, the FV analog
    of the reference datasets' mixed-FEM (Raviart-Thomas) fluxes
    (utils/fenics.py:43-49): face fluxes telescope exactly (discretely
    divergence-free), so the nodal average has near-zero image-gradient
    divergence — unlike the naive ``-K_node * grad_fd(u)``, whose pointwise
    products of rough K with rough gradients violate continuity at O(1)
    (that inconsistency put the physics-loss floor at ~16 on GRF fields).
    """
    n = K.shape[-1]
    h = 1.0 / (n - 1)
    # horizontal face fluxes on vertical faces, (n, n-1)
    fx = -_harm(K[..., :, :-1], K[..., :, 1:]) * (u[..., :, 1:] - u[..., :, :-1]) / h
    # vertical face fluxes on horizontal faces, (n-1, n)
    fy = -_harm(K[..., :-1, :], K[..., 1:, :]) * (u[..., 1:, :] - u[..., :-1, :]) / h
    sigma1, sigma2 = _faces_to_nodes(fx, fy)
    return jnp.stack([u, sigma1, sigma2], axis=-3)


@functools.partial(jax.jit, static_argnames=("tol", "maxiter"))
def solve_darcy_batch(K_batch: jax.Array, tol: float = 1e-8,
                      maxiter: int = 4000) -> jax.Array:
    """Solve a batch: (B, n, n) permeabilities -> (B, 3, n, n) fields."""
    def one(K):
        u = solve_darcy(K, tol=tol, maxiter=maxiter)
        return darcy_fields(K, u)
    return jax.vmap(one)(K_batch)


def solve_darcy_batch_fast(K_batch: jax.Array,
                           n_iter: int | None = None) -> jax.Array:
    """TPU fast path: the in-VMEM Pallas PCG kernel (ops/kernels/cg_darcy.py)
    with the XLA solver as fallback on non-TPU backends.  Honest
    (fetch-fenced) timing on v5e is parity with the XLA CG path (35.4 vs
    31.5 ms/batch64 @ 64x64); the kernel keeps the whole iteration in VMEM
    (one HBM read of K, one write of u per field) and is the in-framework
    pattern for bandwidth-bound iterative solvers.

    ``n_iter`` defaults to ``24 * n`` (1536 at 64x64) — sized at 64x64 for
    channelized contrast (K ratio 100, the hardest shipped family) and
    scaled linearly with the grid size since unpreconditioned-CG-style
    iteration counts grow ~1/h for the FV Laplacian.  Guarded by
    tests/test_pallas_kernels.py::test_pallas_cg_channelized_contrast
    (rel err < 1e-4 vs a tol-1e-8 solve at proportional iterations) and by
    a compiled-path measurement on TPU (docs/RESULTS.md)."""
    if n_iter is None:
        n_iter = 24 * K_batch.shape[-1]
    if jax.default_backend() != "tpu":
        return solve_darcy_batch(K_batch)
    from ..ops.kernels.cg_darcy import solve_darcy_pallas
    u = solve_darcy_pallas(K_batch, n_iter=n_iter)
    return jax.vmap(darcy_fields)(K_batch, u)


# ---------------------------------------------------------------------------
# Nonlinear law
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4))
def _sigma_from_grad(K: jax.Array, g: jax.Array, alpha1: float,
                     alpha2: float, newton_iters: int = 20) -> jax.Array:
    """Componentwise solve sigma + a1 sqrt(K) sigma^2 + a2 K sigma^3 = -K g.

    The cubic is strictly monotone for alpha2 >= alpha1^2/3 (discriminant of
    f' negative), so scalar Newton from the linear guess converges; iterations
    are vectorized over the whole field.  Differentiation is implicit (see
    the custom JVP below) — the outer Newton-Krylov loop never differentiates
    through these iterations.
    """
    rhs = -K * g
    s = rhs  # linear-law initialization

    def body(_, s):
        f = s + alpha1 * jnp.sqrt(K) * s * s + alpha2 * K * s ** 3 - rhs
        fp = 1.0 + 2.0 * alpha1 * jnp.sqrt(K) * s + 3.0 * alpha2 * K * s * s
        return s - f / fp

    return jax.lax.fori_loop(0, newton_iters, body, s)


@_sigma_from_grad.defjvp
def _sigma_from_grad_jvp(alpha1, alpha2, newton_iters, primals, tangents):
    """Implicit-function-theorem JVP: f(sigma; K, g) = 0 =>
    dsigma = -(f_K dK + f_g dg) / f_sigma."""
    K, g = primals
    dK, dg = tangents
    s = _sigma_from_grad(K, g, alpha1, alpha2, newton_iters)
    sqK = jnp.sqrt(K)
    f_sigma = 1.0 + 2.0 * alpha1 * sqK * s + 3.0 * alpha2 * K * s * s
    f_g = K
    f_K = (alpha1 * s * s / (2.0 * jnp.maximum(sqK, 1e-30))
           + alpha2 * s ** 3 + g)
    ds = -(f_K * dK + f_g * dg) / f_sigma
    return s, ds


def solve_nonlinear_darcy(K: jax.Array, alpha1: float = 1.0,
                          alpha2: float = 1.0, newton_iters: int = 12,
                          cg_tol: float = 1e-6, cg_maxiter: int = 2000):
    """Solve the nonlinear Darcy problem; returns (3, n, n) fields.

    Primal Newton: residual N(u) = div sigma(grad u) (finite-volume form with
    the same mirror/Dirichlet handling as the linear path); the Jacobian
    matvec is `jax.jvp(N, u)` and each Newton step solves J du = -N(u) with
    CG — everything stays inside one jit.

    Replaces utils/fenics.py:13-91 (DRT x CG mixed elements + Newton).
    """
    if alpha2 < (alpha1 ** 2) / 3.0 - 1e-12:
        # f'(sigma) = 1 + 2 a1 sqrt(K) s + 3 a2 K s^2 must have no real
        # roots or the componentwise Newton can divide by ~0 / pick a wrong
        # root and the implicit JVP blows up — fail fast on user alphas
        raise ValueError(
            f"nonlinear law needs alpha2 >= alpha1^2/3 for monotonicity "
            f"(got alpha1={alpha1}, alpha2={alpha2}, "
            f"alpha1^2/3={alpha1 ** 2 / 3.0:.4g})")
    n = K.shape[-1]
    h = 1.0 / (n - 1)
    mask = _interior_mask(n)
    u_d = jnp.zeros((n, n), K.dtype).at[:, 0].set(1.0)

    # face permeabilities (harmonic) and zero flux through top/bottom walls
    Kx = _harm(K[:, :-1], K[:, 1:])         # vertical faces, (n, n-1)
    Ky = _harm(K[:-1, :], K[1:, :])         # horizontal faces, (n-1, n)

    def fluxes(v):
        u = u_d + v * mask
        gx = (u[:, 1:] - u[:, :-1]) / h     # du/dx on vertical faces
        gy = (u[1:, :] - u[:-1, :]) / h     # du/dy on horizontal faces
        return (_sigma_from_grad(Kx, gx, alpha1, alpha2),
                _sigma_from_grad(Ky, gy, alpha1, alpha2))

    def div_of(sx, sy):
        div = (jnp.pad(sx, ((0, 0), (0, 1))) - jnp.pad(sx, ((0, 0), (1, 0)))
               + jnp.pad(sy, ((0, 1), (0, 0))) - jnp.pad(sy, ((1, 0), (0, 0))))
        return div / h * mask

    def residual(v):
        return div_of(*fluxes(v))

    def newton_step(_, v):
        # ONE flux solve feeds both the residual and the preconditioner
        # (each _sigma_from_grad is a 20-sweep cubic solve; XLA does not
        # reliably CSE two separately-traced loops)
        sx, sy = fluxes(v)
        r = div_of(sx, sy)
        jac = lambda dv: jax.jvp(residual, (v,), (dv,))[1]
        # Jacobi preconditioner from the linearized face conductivities
        # K_eff = K / f'(sigma): diag(J) ~= sum of adjacent K_eff / h^2.
        kx_eff = Kx / (1.0 + 2.0 * alpha1 * jnp.sqrt(Kx) * sx
                       + 3.0 * alpha2 * Kx * sx * sx)
        ky_eff = Ky / (1.0 + 2.0 * alpha1 * jnp.sqrt(Ky) * sy
                       + 3.0 * alpha2 * Ky * sy * sy)
        diag = (jnp.pad(kx_eff, ((0, 0), (0, 1))) + jnp.pad(kx_eff, ((0, 0), (1, 0)))
                + jnp.pad(ky_eff, ((0, 1), (0, 0))) + jnp.pad(ky_eff, ((1, 0), (0, 0))))
        diag = diag / (h * h)
        inv_diag = mask / jnp.maximum(diag, 1e-30) + (1.0 - mask)
        dv, _ = jax.scipy.sparse.linalg.cg(jac, -r, tol=cg_tol,
                                           maxiter=cg_maxiter,
                                           M=lambda x: x * inv_diag)
        # backtracking damping: pick the largest step in {1, 1/2, ..., 1/16}
        # that does not increase the residual norm (keeps Newton globalized
        # on rough high-contrast fields)
        r0 = jnp.sum(r * r)
        best_v, best_norm = v, r0
        for k in range(5):
            cand = v + dv * (0.5 ** k)
            rc = residual(cand)
            norm = jnp.sum(rc * rc)
            better = norm < best_norm
            best_v = jnp.where(better, cand, best_v)
            # NOT jnp.minimum: a NaN candidate norm (overflowed full step on
            # rough fields) would poison best_norm and reject every smaller
            # damped step — the exact case the damping exists for
            best_norm = jnp.where(better, norm, best_norm)
        return best_v

    # warm start from the linear-law solution — close to the nonlinear one
    # and cheap; raw u_d (a step function) makes the first Newton residual
    # enormous on high-contrast fields
    v0 = (solve_darcy(K, tol=cg_tol, maxiter=cg_maxiter) - u_d) * mask
    v = jax.lax.fori_loop(0, newton_iters, newton_step, v0)
    u = u_d + v * mask
    # conservative face fluxes averaged to nodes — the SAME label convention
    # as the linear path (shared _faces_to_nodes): the nonlinear law on
    # nodal FD gradients would violate continuity at O(1) on rough fields
    sigma1, sigma2 = _faces_to_nodes(*fluxes(v))
    return jnp.stack([u, sigma1, sigma2], axis=0)
