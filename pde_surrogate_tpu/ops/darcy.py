"""Darcy-flow physics losses.

The PDE (reference: solve_conv_mixed_residual.py:3-8):

    div(K(s) grad u(s)) = 0   on (0,1)^2
    u = 1 at x=0 (left),  u = 0 at x=1 (right),  zero vertical flux top/bottom

Two loss families, matching models/darcy.py in the reference:

* **Conv family** — batched NHWC field images, derivatives from the Sobel
  matmul stencils (`ops.filters.SobelFilter`):
  constitutive + continuity + boundary penalties, plus the nonlinear
  constitutive laws (polynomial and exponential) and the exponential energy
  functional (models/darcy.py:151-233).

* **FC family** — collocation points, derivatives by nested `jax.grad`
  through the network (replacing autograd `create_graph=True`,
  models/darcy.py:51-144).  Networks are pure functions ``f(params, x)``;
  per-point jacobians come from `jax.vmap(jax.jacfwd(...))` which XLA fuses
  into one batched evaluation — no per-sample autograd graphs.

Field layout: images are (B, H, W, C); output channels C = (u, sigma_1,
sigma_2) = (pressure, horizontal flux, vertical flux).  Collocation points
are (N, 2) in (y, x) ordering on [0,1]^2 (reference: utils/sampling.py:16-24).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .filters import SobelFilter

__all__ = [
    "conv_constitutive_constraint",
    "conv_constitutive_constraint_nonlinear",
    "conv_constitutive_constraint_nonlinear_exp",
    "conv_continuity_constraint",
    "conv_boundary_condition",
    "energy_functional_exp",
    "mixed_residual_loss",
    "fv_mixed_residual_loss",
    "fv_cg_error_loss",
    "reconstruct_pressure",
    "flux_pressure_consistency",
    "bilinear_interpolate",
    "mixed_residual_fc",
    "primal_residual_fc",
    "primal_variational_fc",
    "neumann_boundary",
    "neumann_boundary_mixed",
]


# ---------------------------------------------------------------------------
# Conv family (Sobel-stencil derivatives on NHWC images)
# ---------------------------------------------------------------------------


def conv_constitutive_constraint(input: jax.Array, output: jax.Array,
                                 sobel: SobelFilter) -> jax.Array:
    """mean((sigma_hat - (-K grad u))^2), both flux components.

    Reference: models/darcy.py:162-176.

    Args:
      input: K, (B, H, W, 1).
      output: (u, sigma1, sigma2), (B, H, W, 3).
    """
    u = output[..., 0:1]
    grad_h = sobel.grad_h(u)
    grad_v = sobel.grad_v(u)
    est_sigma1 = -input * grad_h
    est_sigma2 = -input * grad_v
    return jnp.mean((output[..., 1:2] - est_sigma1) ** 2
                    + (output[..., 2:3] - est_sigma2) ** 2)


def conv_constitutive_constraint_nonlinear(input: jax.Array, output: jax.Array,
                                           sobel: SobelFilter,
                                           beta1: float, beta2: float) -> jax.Array:
    """Polynomial nonlinear Darcy law residual (models/darcy.py:179-191).

    -K grad u = sigma + beta1 sqrt(K) sigma^2 + beta2 K sigma^3 (componentwise).
    """
    u = output[..., 0:1]
    k_u_h = -input * sobel.grad_h(u)
    k_u_v = -input * sobel.grad_v(u)
    sigma = output[..., 1:3]
    rhs = (sigma + beta1 * jnp.sqrt(input) * sigma ** 2
           + beta2 * input * sigma ** 3)
    return jnp.mean((k_u_h - rhs[..., 0:1]) ** 2 + (k_u_v - rhs[..., 1:2]) ** 2)


def conv_constitutive_constraint_nonlinear_exp(input: jax.Array,
                                               output: jax.Array,
                                               sobel: SobelFilter) -> jax.Array:
    """Exponential nonlinear law sigma = -exp(K u) grad u (models/darcy.py:193-208)."""
    u = output[..., 0:1]
    grad_h = sobel.grad_h(u)
    grad_v = sobel.grad_v(u)
    coef = jnp.exp(input * u)
    return jnp.mean((output[..., 1:2] + coef * grad_h) ** 2
                    + (output[..., 2:3] + coef * grad_v) ** 2)


def conv_continuity_constraint(output: jax.Array, sobel: SobelFilter,
                               use_tb: bool = True) -> jax.Array:
    """mean((d sigma1/dx + d sigma2/dy)^2)  (models/darcy.py:210-224).

    ``use_tb=False`` excludes the top and bottom rows from the mean.
    """
    sigma1_x = sobel.grad_h(output[..., 1:2])
    sigma2_y = sobel.grad_v(output[..., 2:3])
    div = (sigma1_x + sigma2_y) ** 2
    if use_tb:
        return jnp.mean(div)
    return jnp.mean(div[:, 1:-1, :, :])


def conv_boundary_condition(output: jax.Array):
    """(dirichlet, neumann) boundary MSEs (models/darcy.py:226-233).

    Dirichlet: u=1 on the left column, u=0 on the right column.
    Neumann: sigma2=0 on the top and bottom rows.
    """
    left = output[:, :, 0, 0]
    right = output[:, :, -1, 0]
    top_down_flux = output[:, jnp.array([0, -1]), :, 2]
    loss_dirichlet = jnp.mean((left - 1.0) ** 2) + jnp.mean(right ** 2)
    loss_neumann = jnp.mean(top_down_flux ** 2)
    return loss_dirichlet, loss_neumann


def energy_functional_exp(input: jax.Array, output: jax.Array,
                          sobel: SobelFilter) -> jax.Array:
    """Variational energy for the exponential law (models/darcy.py:151-159).

    V(u, K) = mean(0.5 exp(K u) |grad u|^2); here ``output`` is the scalar
    field u with the same channel layout as the reference call site.
    """
    grad_h = sobel.grad_h(output)
    grad_v = sobel.grad_v(output)
    return jnp.mean(0.5 * jnp.exp(input * output) * (grad_h ** 2 + grad_v ** 2))


def mixed_residual_loss(input: jax.Array, output: jax.Array,
                        sobel: SobelFilter, weight_bound: float = 10.0,
                        nonlinear: str | None = None,
                        beta1: float = 1.0, beta2: float = 1.0):
    """Fused physics loss = constitutive + continuity + w_b * boundary.

    One jitted region for the whole mixed-residual objective (the hot loss in
    train_codec_mixed_residual.py:228-232); returns
    ``(loss, (pde, dirichlet, neumann))``.
    """
    if nonlinear is None:
        constitutive = conv_constitutive_constraint(input, output, sobel)
    elif nonlinear == "poly":
        constitutive = conv_constitutive_constraint_nonlinear(
            input, output, sobel, beta1, beta2)
    elif nonlinear == "exp":
        constitutive = conv_constitutive_constraint_nonlinear_exp(
            input, output, sobel)
    else:
        raise ValueError(f"unknown nonlinear law: {nonlinear}")
    continuity = conv_continuity_constraint(output, sobel)
    dirichlet, neumann = conv_boundary_condition(output)
    pde = constitutive + continuity
    loss = pde + weight_bound * (dirichlet + neumann)
    return loss, (pde, dirichlet, neumann)


def fv_mixed_residual_loss(input: jax.Array, output: jax.Array,
                           weight_bound: float = 10.0):
    """Finite-volume mixed-residual loss — the exactly-identifiable
    label-free objective (round-3 addition; no reference counterpart).

    The Sobel mixed residual (mixed_residual_loss) is misaligned with the
    dataset labels: the TRUE fields score loss ~0.4 and training descends
    below that into flat directions the metrics see (docs/RESULTS.md,
    docs/DESIGN.md 4b) — the root cause of the u-drift lottery and of the
    channelized wall (Sobel stencils difference across the binary-K
    discontinuity).  This loss instead uses the SAME discretization the
    in-framework label oracle solves (solvers/fd_darcy):

    * ``residual``: the conservative FV divergence of u's face fluxes
      (harmonic-mean face conductivities, zero-flux mirror faces top/bottom),
      Jacobi-normalized (divided by the operator diagonal) so both facies of
      a contrast-100 field carry equal weight and the term is dimensionless;
    * ``flux consistency``: the predicted flux channels must equal u's
      conservative face fluxes averaged to nodes — the exact label
      convention (fd_darcy.darcy_fields);
    * ``dirichlet``: the u=1-x boundary columns (weight ``weight_bound``).

    loss = 0  <=>  u is the unique FV solution and the fluxes are the
    labels — unlike the Sobel objective there are NO spurious minima, and
    the harmonic face averaging respects discontinuous K.

    Returns ``(loss, (pde, dirichlet, neumann))`` with the same structure as
    ``mixed_residual_loss`` (pde = residual + flux-consistency; neumann is
    folded into the flux-consistency term via the zero top/bottom walls of
    the reference fluxes).
    """
    from ..solvers.fd_darcy import _faces_to_nodes, _harm

    K = input[..., 0]                     # (B, n, n)
    u = output[..., 0]
    sigma = output[..., 1:]               # (B, n, n, 2)
    n = K.shape[-1]
    h = 1.0 / (n - 1)

    Kx = _harm(K[..., :, :-1], K[..., :, 1:])     # vertical faces (B,n,n-1)
    Ky = _harm(K[..., :-1, :], K[..., 1:, :])     # horizontal faces (B,n-1,n)
    fx = -Kx * (u[..., :, 1:] - u[..., :, :-1]) / h
    fy = -Ky * (u[..., 1:, :] - u[..., :-1, :]) / h

    def pad_x(a, left, right):
        return jnp.pad(a, ((0, 0),) * (a.ndim - 2) + ((0, 0), (left, right)))

    def pad_y(a, top, bottom):
        return jnp.pad(a, ((0, 0),) * (a.ndim - 2) + ((top, bottom), (0, 0)))

    # conservative divergence at nodes (missing boundary faces contribute 0
    # == the zero-flux mirror at the horizontal walls)
    div = (pad_x(fx, 0, 1) - pad_x(fx, 1, 0)
           + pad_y(fy, 0, 1) - pad_y(fy, 1, 0)) / h
    # Jacobi normalization: diag(A) = sum of adjacent face conductivities/h^2
    diag = (pad_x(Kx, 0, 1) + pad_x(Kx, 1, 0)
            + pad_y(Ky, 0, 1) + pad_y(Ky, 1, 0)) / (h * h)
    r = div / jnp.maximum(diag, 1e-30)
    residual = jnp.mean(r[..., :, 1:-1] ** 2)    # interior of Dirichlet cols

    s1_ref, s2_ref = _faces_to_nodes(fx, fy)
    flux_consistency = jnp.mean(
        (sigma - jnp.stack([s1_ref, s2_ref], axis=-1)) ** 2)

    dirichlet = (jnp.mean((u[..., :, 0] - 1.0) ** 2)
                 + jnp.mean(u[..., :, -1] ** 2))
    # sigma2's zero walls are enforced through s2_ref's exact zeros; report
    # that share as the "neumann" diagnostic for logging parity
    neumann = (jnp.mean(sigma[..., 0, :, 1] ** 2)
               + jnp.mean(sigma[..., -1, :, 1] ** 2))

    pde = residual + flux_consistency
    loss = pde + weight_bound * dirichlet
    return loss, (pde, dirichlet, neumann)


def _resolve_n_cg(n_cg: int | None, n: int) -> int:
    """Grid-scaled CG depth: ``None`` -> ``n`` iterations.

    kappa(A) ~ n^2 * contrast, so the Krylov depth needed to reach the
    smooth error modes grows ~ sqrt(kappa) ~ n — a fixed 64 that works at
    64^2 under-resolves 128^2 (measured: the 128^2 hybrid stalled at
    u R^2 0.82, docs/RESULTS.md).  Mirrors the label solver's
    grid-proportional iteration sizing (solvers/fd_darcy.py n_iter=24*n),
    scaled down because the loss needs an error *estimate*, not a solve.
    """
    return n if n_cg is None else n_cg


def _cg_pressure_errors(input: jax.Array, output: jax.Array,
                        n_cg: int | None = None) -> jax.Array:
    """Per-sample CG-recovered pressure error e_k, shape (B, n, n).

    Runs ``n_cg`` Jacobi-preconditioned CG iterations on A(K) e = r(u_hat)
    where r is the FV residual of the predicted pressure — so u_hat + e_k
    approaches the true FV solution u* regardless of how wrong u_hat is.
    Entirely label-free: only K and the net's own prediction enter.
    """
    from ..solvers.fd_darcy import (_apply_operator, _face_conductivities,
                                    _interior_mask)

    K = input[..., 0]
    u = output[..., 0]
    n = K.shape[-1]
    n_cg = _resolve_n_cg(n_cg, n)

    def cg_error(Ki, ui):
        faces = _face_conductivities(Ki)
        aE, aW, aN, aS = faces
        mask = _interior_mask(n)
        u_d = jnp.zeros((n, n), Ki.dtype).at[:, 0].set(1.0)
        b = -_apply_operator(u_d, faces) * mask
        inv_diag = mask / jnp.maximum(aE + aW + aN + aS, 1e-30)
        matvec = lambda v: _apply_operator(v * mask, faces) * mask
        r = (b - matvec((ui - u_d) * mask)) * mask

        def dot(a, c):
            return jnp.sum(a * c)

        e = jnp.zeros_like(r)
        z = r * inv_diag
        p = z
        rz = dot(r, z)

        def body(_, carry):
            e, r, p, rz = carry
            ap = matvec(p)
            alpha = rz / (dot(p, ap) + 1e-30)
            e = e + alpha * p
            r = r - alpha * ap
            z = r * inv_diag
            rz_new = dot(r, z)
            beta = rz_new / (rz + 1e-30)
            p = z + beta * p
            return e, r, p, rz_new

        e, _, _, _ = jax.lax.fori_loop(0, n_cg, body, (e, r, p, rz))
        return e

    return jax.vmap(cg_error)(K, u)


def fv_cg_u_error(input: jax.Array, output: jax.Array,
                  n_cg: int | None = None) -> jax.Array:
    """The CG-preconditioned pressure-error estimate, ``mean(e_k^2)``.

    The u-term of ``fv_cg_error_loss``, exposed standalone so the hybrid
    ``sobel_fvcg`` objective can add an exact (label-free) pressure anchor
    to the reference's Sobel mixed residual: the Sobel loss leaves u's
    interior offset nearly flat (the u-drift lottery; the channelized
    wall), while ``A e = r`` recovers the pressure error itself.  Measured
    alone (docs/RESULTS.md): u R^2 0.982 on channelized — but fluxes worse
    than Sobel's, hence the hybrid.  ``n_cg=None`` scales the CG depth
    with the grid (_resolve_n_cg).
    """
    e = _cg_pressure_errors(input, output, n_cg)
    return jnp.mean(e ** 2)


def fv_cg_anchors(input: jax.Array, output: jax.Array,
                  n_cg: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Pressure AND flux anchors from the CG-corrected pressure (round 4).

    Returns ``(err_u, err_flux)``:

    * ``err_u = mean(e_k^2)`` — exactly ``fv_cg_u_error``.
    * ``err_flux = mean((sigma - flux(u_hat + e_k))^2)`` — penalizes the
      predicted fluxes against the conservative face fluxes of the
      CG-*corrected* pressure, node-averaged with the exact label
      convention (solvers/fd_darcy.darcy_fields).

    Round-3's hybrid anchored only u; its flux supervision was the Sobel
    constitutive term, whose target ``-K grad_sobel(u_hat)`` inherits
    u_hat's error and the stencil's truncation error — the measured
    channelized flux wall (R^2 0.84/0.45 vs supervised 1.00/0.99,
    docs/RESULTS.md).  Since u_hat + e_k ~= u* independently of training
    state, ``flux(u_hat + e_k)`` is a near-label target available
    label-free; objective family extends
    /root/reference/models/darcy.py:162-233.

    The Dirichlet columns of the corrected pressure are CLAMPED to the
    exact boundary values (known constants — still label-free): the CG
    system eliminates those DOFs, so e_k is zero there and u_hat's own
    boundary error would otherwise pollute the boundary-adjacent flux
    target through the 1/h face gradient.  Measured (channelized contrast
    100, corrupted u_hat): without the clamp the target's flux error
    PLATEAUS at 0.20/0.50 rel (h/v) no matter the CG depth; with it,
    0.017/0.033 at n_cg=128 and 7e-4/2e-3 at 256 — near-label.
    """
    from ..solvers.fd_darcy import (_faces_to_nodes, _harm, _interior_mask)

    K = input[..., 0]
    u = output[..., 0]
    sigma = output[..., 1:]
    n = K.shape[-1]
    h = 1.0 / (n - 1)

    e = _cg_pressure_errors(input, output, n_cg)
    err_u = jnp.mean(e ** 2)

    mask = _interior_mask(n)
    u_d = jnp.zeros((n, n), K.dtype).at[:, 0].set(1.0)
    u_corr = (u + e) * mask + u_d
    Kx = _harm(K[..., :, :-1], K[..., :, 1:])
    Ky = _harm(K[..., :-1, :], K[..., 1:, :])
    fx = -Kx * (u_corr[..., :, 1:] - u_corr[..., :, :-1]) / h
    fy = -Ky * (u_corr[..., 1:, :] - u_corr[..., :-1, :]) / h
    s1_ref, s2_ref = _faces_to_nodes(fx, fy)
    err_flux = jnp.mean(
        (sigma - jnp.stack([s1_ref, s2_ref], axis=-1)) ** 2)
    return err_u, err_flux


def fv_cg_error_loss(input: jax.Array, output: jax.Array,
                     weight_bound: float = 10.0, n_cg: int | None = None):
    """Preconditioned-error label-free objective (round-3; no reference
    counterpart): k CG iterations applied to the FV residual INSIDE the loss.

    Measured motivation (logs/fv_channelized_300ep.log): the exactly-
    identifiable FV residual (fv_mixed_residual_loss) trains to loss 2e-4 on
    channelized while test u R^2 ~ 0 — identifiability is not the wall,
    CONDITIONING is.  ||r|| small does not imply ||e|| small when
    kappa(A) ~ n^2 * contrast: smooth error modes produce residuals smaller
    by the eigenvalue ratio, so residual descent leaves the smooth
    components of the error untouched.

    Fix: the error satisfies A e = r exactly, so run ``n_cg`` Jacobi-
    preconditioned CG iterations on (A(K), r(u_hat)) inside the loss and
    penalize ``mean(e_k^2)``.  As n_cg -> infinity this IS the squared error
    norm ||u_hat - u*||^2 (perfectly conditioned, gradient ~ the error
    itself); at n_cg ~ 64 the Krylov polynomial already amplifies the smooth
    modes the raw residual cannot see.  Cost: n_cg stencil matvecs
    (~megaFLOPs) — invisible next to the 137-GFLOP DenseED step.  Still
    label-free: no solver output is ever compared against, only K and the
    net's own prediction enter.

    Same return structure as ``mixed_residual_loss``; pde = cg-error +
    flux-consistency.  Round 4: the flux target is the CG-*corrected*
    pressure's conservative face fluxes (``fv_cg_anchors``) — round 3
    anchored sigma to u_hat's OWN fluxes, which inherit u_hat's error and
    measured channelized flux R^2 0.66/0.24; flux(u_hat + e_k) ~= the true
    fluxes regardless of training state, at zero extra cost (e_k is
    already computed for the u term).
    """
    K = input[..., 0]                     # (B, n, n)
    u = output[..., 0]
    sigma = output[..., 1:]               # (B, n, n, 2)

    err_u, flux_consistency = fv_cg_anchors(input, output, n_cg)

    dirichlet = (jnp.mean((u[..., :, 0] - 1.0) ** 2)
                 + jnp.mean(u[..., :, -1] ** 2))
    neumann = (jnp.mean(sigma[..., 0, :, 1] ** 2)
               + jnp.mean(sigma[..., -1, :, 1] ** 2))

    pde = err_u + flux_consistency
    loss = pde + weight_bound * dirichlet
    return loss, (pde, dirichlet, neumann)


def reconstruct_pressure(input: jax.Array, output: jax.Array) -> jax.Array:
    """Pressure from the predicted horizontal flux, label-free.

    sigma_1 = -K du/dx with the known Dirichlet values u(x=0)=1, u(x=1)=0,
    so  u(x) = 1 - int_0^x sigma1_hat/K.  Trapezoid cumulative integral
    along x from BOTH edges, blended linearly toward the nearer anchor to
    halve accumulated flux error.  input (B,H,W,1|C) with K in channel 0,
    output (B,H,W,3) -> (B,H,W) reconstructed u.
    """
    K = input[..., 0]
    n = output.shape[-2]
    dudx = -output[..., 1] / K
    # spacing 1/n, NOT 1/(n-1): the constitutive loss drives sigma1 toward
    # -K * sobel.grad_h(u) and the Sobel operators scale by imsize n
    # (reference convention, ops/filters.py) — integrating with 1/n inverts
    # that convention exactly, so a perfectly self-consistent net scores 0
    # instead of an n/(n-1) floor (~0.008 rel-L2 at n=64)
    mids = 0.5 * (dudx[:, :, 1:] + dudx[:, :, :-1]) / n
    cum = jnp.concatenate(
        [jnp.zeros_like(mids[:, :, :1]), jnp.cumsum(mids, axis=2)], axis=2)
    u_left = 1.0 + cum                 # anchored at u(x=0) = 1
    u_right = cum - cum[:, :, -1:]     # anchored at u(x=1) = 0
    w = jnp.linspace(0.0, 1.0, n)[None, None, :]
    return (1.0 - w) * u_left + w * u_right


def flux_pressure_consistency(input: jax.Array, output: jax.Array
                              ) -> jax.Array:
    """Label-free drift metric: rel-L2 between the net's u and the
    flux-integrated u (``reconstruct_pressure``), per batch.

    The mixed residual pins u only weakly (the loss valley is nearly flat
    along an interior-offset direction — docs/RESULTS.md seed matrix), so
    long schedules can freeze u drifted while fluxes stay accurate.  The
    drift is invisible to the physics loss but NOT to this metric: across
    the canonical runs it separates drifted checkpoints (0.2-0.9) from
    clean ones (0.05-0.12), and argmin-consistency checkpoint selection
    recovers u R^2 0.89-0.98 for every seed (tools/consistency_probe.py).
    """
    u_hat = output[..., 0]
    u_rec = reconstruct_pressure(input, output)
    num = jnp.sqrt(jnp.sum((u_hat - u_rec) ** 2, axis=(1, 2)))
    den = jnp.sqrt(jnp.sum(u_rec ** 2, axis=(1, 2)))
    return jnp.mean(num / den)


# ---------------------------------------------------------------------------
# FC family (collocation points, nested jax.grad)
# ---------------------------------------------------------------------------


def bilinear_interpolate(im: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinearly interpolate image ``im`` (H, W) at pixel coords (x, y).

    Functional equivalent of models/darcy.py:18-48 (gather + lerp), with the
    cell index clamped to size-2 so points exactly on the top/right edge
    interpolate correctly (the reference's double clamp zeroes all four
    weights there).  Returns (N,) values for (N,) coordinate vectors.
    """
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, im.shape[1] - 2)
    x1 = x0 + 1
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, im.shape[0] - 2)
    y1 = y0 + 1
    ia = im[y0, x0]
    ib = im[y1, x0]
    ic = im[y0, x1]
    id_ = im[y1, x1]
    x0f, x1f = x0.astype(x.dtype), x1.astype(x.dtype)
    y0f, y1f = y0.astype(y.dtype), y1.astype(y.dtype)
    wa = (x1f - x) * (y1f - y)
    wb = (x1f - x) * (y - y0f)
    wc = (x - x0f) * (y1f - y)
    wd = (x - x0f) * (y - y0f)
    return ia * wa + ib * wb + ic * wc + id_ * wd


def _pointwise_val_jac(model_fn: Callable, params, x: jax.Array):
    """Per-point (value, Jacobian dy/dx): ((N, out), (N, out, 2)).

    Replaces the reference's repeated ``autograd.grad(..., create_graph=True)``
    calls (models/darcy.py:13-15): forward-mode over the 2-D input is exact,
    cheap (2 JVPs), and fuses into one batched XLA computation.  ``has_aux``
    returns the primal from the same evaluation, so the caller pays no
    separate forward pass for the network outputs.
    """
    def f(pt):
        out = model_fn(params, pt[None, :])[0]
        return out, out

    jac, val = jax.vmap(jax.jacfwd(f, has_aux=True))(x)
    return val, jac


def mixed_residual_fc(model_fn: Callable, params, x: jax.Array, K: jax.Array,
                      rand_colloc: bool = False,
                      imsize: int | None = None) -> jax.Array:
    """Mixed-form residual at collocation points (models/darcy.py:113-144).

    Args:
      model_fn: ``f(params, x) -> (N, 3)`` with channels (u, tau_ver, tau_hor)
        — note the reference's FC channel order (y-flux then x-flux,
        solve_fc_mixed_residual.py:170-174).
      x: (N, 2) points in (y, x) ordering on [0,1]^2.
      K: (N, 1) on-grid permeability, or (H*W, 1) grid values when
        ``rand_colloc`` (interpolated at x like the reference).
      imsize: grid size, required when ``rand_colloc``.

    Returns constitutive + continuity scalar loss.
    """
    y, u_x = _pointwise_val_jac(model_fn, params, x)  # (N, 3), (N, 3, 2)
    tau = y[:, 1:3]
    grad_u = u_x[:, 0, :]                       # (N, 2) = (du/dy, du/dx)
    grad_tau_ver = u_x[:, 1, 0]                 # d tau_ver / dy
    grad_tau_hor = u_x[:, 2, 1]                 # d tau_hor / dx

    if rand_colloc:
        if imsize is None:
            raise ValueError("imsize required for off-grid collocation")
        grid = K.reshape(imsize, imsize)
        # reference interpolates at pixel coords (x*[W-1]? -- it passes raw
        # [0,1] coords scaled implicitly by grid indexing; match by scaling
        # to pixel space (models/darcy.py:133 with sampler [0,1] coords maps
        # to floor() on [0,1] which collapses to cell 0; we use the corrected
        # pixel-space interpolation).
        kx = x[:, 1] * (imsize - 1)
        ky = x[:, 0] * (imsize - 1)
        K = bilinear_interpolate(grid, kx, ky)[:, None]

    loss_constitutive = jnp.mean((K * grad_u + tau) ** 2)
    loss_continuity = jnp.mean((grad_tau_ver + grad_tau_hor) ** 2)
    return loss_constitutive + loss_continuity


def primal_residual_fc(model_fn: Callable, params, x: jax.Array,
                       K_grad_ver: jax.Array, K_grad_hor: jax.Array,
                       K: jax.Array) -> jax.Array:
    """Second-order primal residual (models/darcy.py:51-78).

    div(K grad u) expanded = gradK . gradu + K lap(u); needs second
    derivatives — jacfwd-of-jacfwd, still one fused batched computation.
    """
    def u_single(pt):
        return model_fn(params, pt[None, :])[0, 0]

    grad_u = jax.vmap(jax.grad(u_single))(x)                  # (N, 2)
    hess_u = jax.vmap(jax.hessian(u_single))(x)               # (N, 2, 2)
    div = (K_grad_ver * grad_u[:, 0] + K * hess_u[:, 0, 0]
           + K_grad_hor * grad_u[:, 1] + K * hess_u[:, 1, 1])
    return jnp.mean(div ** 2)


def primal_variational_fc(model_fn: Callable, params, x: jax.Array,
                          K: jax.Array) -> jax.Array:
    """Energy functional mean(0.5 K |grad u|^2) (models/darcy.py:97-110)."""
    def u_single(pt):
        return model_fn(params, pt[None, :])[0, 0]

    grad_u = jax.vmap(jax.grad(u_single))(x)
    return jnp.mean(0.5 * K * jnp.sum(grad_u ** 2, axis=1))


def neumann_boundary_mixed(model_fn: Callable, params, x: jax.Array) -> jax.Array:
    """mean(tau_ver^2) on top/bottom points (models/darcy.py:88-94)."""
    y = model_fn(params, x)
    return jnp.mean(y[:, 1] ** 2)


def neumann_boundary(model_fn: Callable, params, x: jax.Array) -> jax.Array:
    """Primal-form Neumann penalty mean((du/dy)^2) on top/bottom points.

    Parity note: the reference's "bug: u_y! NOT u_x" comment
    (models/darcy.py:81) records an already-fixed issue — its code indexes
    coordinate 0, which IS y under the (y, x) point ordering.  This
    implementation matches that behavior (du/dy); neither repo's drivers
    use the primal variant (they use neumann_boundary_mixed).
    """
    def u_single(pt):
        return model_fn(params, pt[None, :])[0, 0]

    grad_u = jax.vmap(jax.grad(u_single))(x)
    return jnp.mean(grad_u[:, 0] ** 2)
