"""Validation of the finite-volume Darcy solvers (the FEniCS replacement)."""

import numpy as np
import jax.numpy as jnp

from pde_surrogate_tpu.solvers.fd_darcy import (
    solve_darcy, solve_darcy_batch, solve_nonlinear_darcy, darcy_fields)
from pde_surrogate_tpu.data.grf import sample_kle


def test_constant_k_linear_solution():
    """K = 1: exact solution u = 1 - x, sigma = (1, 0)."""
    n = 33
    K = jnp.ones((n, n))
    u = solve_darcy(K)
    x = np.linspace(0, 1, n)
    np.testing.assert_allclose(np.asarray(u), np.tile(1 - x, (n, 1)),
                               atol=1e-5)
    fields = np.asarray(darcy_fields(K, u))
    np.testing.assert_allclose(fields[1], 1.0, atol=1e-4)
    np.testing.assert_allclose(fields[2], 0.0, atol=1e-4)


def test_layered_k_exact():
    """K = K(x) separable: u(x) solves (K u')' = 0 -> flux is constant.

    For K = 1 + x the exact solution is u = 1 - ln(1+x)/ln 2 with constant
    horizontal flux 1/ln 2.
    """
    n = 65
    x = np.linspace(0, 1, n)
    K = jnp.asarray(np.tile(1 + x, (n, 1)))
    u = solve_darcy(K)
    expect = 1 - np.log(1 + x) / np.log(2)
    np.testing.assert_allclose(np.asarray(u), np.tile(expect, (n, 1)),
                               atol=2e-3)
    fields = np.asarray(darcy_fields(K, u))
    np.testing.assert_allclose(fields[1][:, 2:-2], 1 / np.log(2), atol=5e-3)


def test_flux_conservation_random_k(rng):
    """Finite-volume mass balance: the total horizontal *face* flux through
    every vertical cut is identical (exact up to CG tolerance)."""
    n = 32
    K = np.asarray(sample_kle(1, n, 64, rng=rng)[0], dtype=np.float64)
    u = np.asarray(solve_darcy(jnp.asarray(K)), dtype=np.float64)
    h = 1.0 / (n - 1)
    k_face = 2 * K[:, :-1] * K[:, 1:] / (K[:, :-1] + K[:, 1:])
    flux = -k_face * (u[:, 1:] - u[:, :-1]) / h  # (n, n-1) face fluxes
    cut = flux.sum(axis=0)
    assert np.abs(cut - cut.mean()).max() / np.abs(cut.mean()) < 1e-4
    # and the nodal sigma1 field agrees with the face fluxes to O(h)
    fields = np.asarray(darcy_fields(jnp.asarray(K), jnp.asarray(u)))
    col_flux = fields[1].sum(axis=0)[3:-3]
    assert np.abs(col_flux - cut.mean()).max() / np.abs(cut.mean()) < 0.15


def test_boundary_conditions_random_k(rng):
    n = 32
    K = jnp.asarray(sample_kle(1, n, 64, rng=rng)[0])
    u = np.asarray(solve_darcy(K))
    np.testing.assert_allclose(u[:, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(u[:, -1], 0.0, atol=1e-6)
    assert u.min() > -1e-3 and u.max() < 1 + 1e-3  # maximum principle


def test_batch_solver(rng):
    n = 32
    K = jnp.asarray(sample_kle(3, n, 64, rng=rng))
    out = solve_darcy_batch(K)
    assert out.shape == (3, 3, n, n)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_nonlinear_reduces_to_linear():
    """alpha1 = alpha2 = 0 recovers the linear solution."""
    n = 33
    K = jnp.ones((n, n)) * 2.0
    lin = np.asarray(darcy_fields(K, solve_darcy(K)))
    non = np.asarray(solve_nonlinear_darcy(K, alpha1=0.0, alpha2=0.0))
    np.testing.assert_allclose(non[0], lin[0], atol=1e-4)


def test_nonlinear_random_k_bounded(rng):
    """Random high-contrast K: globalized Newton stays in [0, 1] (maximum
    principle) — regression for divergence from the step-function init."""
    n = 32
    K = jnp.asarray(sample_kle(1, n, 128, rng=rng)[0])
    out = np.asarray(solve_nonlinear_darcy(K, 1.0, 1.0))
    assert out[0].min() > -1e-2 and out[0].max() < 1 + 1e-2
    np.testing.assert_allclose(out[0][:, 0], 1.0, atol=1e-4)
    np.testing.assert_allclose(out[0][:, -1], 0.0, atol=1e-4)


def test_nonlinear_rejects_nonmonotone_alphas():
    """alpha2 < alpha1^2/3 makes f'(sigma) lose positivity — the
    componentwise Newton and implicit JVP both depend on it; fail fast."""
    import pytest
    K = jnp.ones((8, 8))
    with pytest.raises(ValueError, match="monotonicity"):
        solve_nonlinear_darcy(K, alpha1=2.0, alpha2=1.0)
    # boundary of the admissible region is fine
    solve_nonlinear_darcy(K, alpha1=1.0, alpha2=1.0 / 3.0, newton_iters=1)


def test_nonlinear_damping_survives_nan_candidate():
    """A NaN residual on the full step must not poison the backtracking
    search (regression: jnp.minimum propagated NaN into best_norm and
    rejected every damped candidate, silently returning the warm start)."""
    n = 16
    # extreme contrast to stress the full-step candidate
    K = jnp.ones((n, n)).at[:, n // 2:].set(1e4)
    out = np.asarray(solve_nonlinear_darcy(K, 1.0, 1.0))
    assert np.isfinite(out).all()
    # the nonlinear solve must move off the linear warm start: at these
    # alphas the flux law differs at O(1), so sigma must differ too
    lin = np.asarray(darcy_fields(K, solve_darcy(K)))
    assert np.abs(out[1] - lin[1]).max() > 1e-4


def test_nonlinear_constant_k():
    """K = 1, alpha1 = alpha2 = 1: by symmetry u is 1-D in x; the flux law
    changes the profile but BCs and monotonicity must hold, and the
    constitutive relation must be satisfied pointwise."""
    n = 33
    K = jnp.ones((n, n))
    out = np.asarray(solve_nonlinear_darcy(K, 1.0, 1.0))
    u, s1, _ = out
    np.testing.assert_allclose(u[:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(u[:, -1], 0.0, atol=1e-5)
    assert np.all(np.diff(u[n // 2]) <= 1e-6)  # monotone in x
    # constitutive check at interior nodes: -K du/dx = s + sqrt(K) s^2 + K s^3
    h = 1.0 / (n - 1)
    dudx = (u[:, 2:] - u[:, :-2]) / (2 * h)
    rhs = s1 + s1 ** 2 + s1 ** 3
    np.testing.assert_allclose(-dudx[:, :], rhs[:, 1:-1], atol=5e-3)


def test_darcy_fields_direct_batch(rng):
    """darcy_fields accepts (B, n, n) directly and matches the vmapped form
    (regression: hard-coded 2-D pad widths raised on batched input)."""
    import jax
    n = 17
    K = jnp.asarray(sample_kle(3, n, 32, rng=rng))
    u = jax.vmap(solve_darcy)(K)
    direct = np.asarray(darcy_fields(K, u))
    vmapped = np.asarray(jax.vmap(darcy_fields)(K, u))
    assert direct.shape == (3, 3, n, n)
    np.testing.assert_array_equal(direct, vmapped)


def test_nonlinear_flux_labels_are_conservative():
    """Nonlinear labels follow the same conservative face-flux-to-node
    convention as the linear path: the image-gradient divergence of the
    flux field must be near zero (regression: the nonlinear law applied to
    nodal FD gradients violated continuity at O(1))."""
    n = 33
    K = jnp.asarray(sample_kle(1, n, 64, rng=5)[0])
    out = np.asarray(solve_nonlinear_darcy(K, 0.1, 0.1))
    _, s1, s2 = out
    h = 1.0 / (n - 1)
    div = ((s1[1:-1, 2:] - s1[1:-1, :-2]) + (s2[2:, 1:-1] - s2[:-2, 1:-1])) / (2 * h)
    # compare against the naive nodal-law fluxes' divergence on the same u
    from pde_surrogate_tpu.solvers.fd_darcy import _grad_fd, _sigma_from_grad
    u = jnp.asarray(out[0])
    s1n = np.asarray(_sigma_from_grad(K, _grad_fd(u, -1, h), 0.1, 0.1))
    s2n = np.asarray(_sigma_from_grad(K, _grad_fd(u, -2, h), 0.1, 0.1))
    div_naive = ((s1n[1:-1, 2:] - s1n[1:-1, :-2])
                 + (s2n[2:, 1:-1] - s2n[:-2, 1:-1])) / (2 * h)
    assert np.abs(div).mean() < 0.25 * np.abs(div_naive).mean()


def test_nonlinear_grid_convergence():
    """The nonlinear FV-Newton oracle converges under grid refinement.

    Smooth analytic K on nested grids (17 -> 33 -> 65; coarse nodes are a
    stride-2 subset of fine nodes): successive-difference L2 errors must
    shrink at the scheme's first-order rate (harmonic face means built from
    *nodal* K samples are O(h) for smooth variable coefficients; measured
    order 0.88 at these sizes, 0.95 by 129^2 in f64).  Completes the oracle
    validation pair next to alpha->0 exactness above; replaces
    /root/reference/utils/fenics.py:13-91 as the nonlinear reference.
    """
    def K_at(n):
        x = jnp.linspace(0.0, 1.0, n)
        X, Y = jnp.meshgrid(x, x, indexing="xy")
        return jnp.exp(0.8 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y))

    us = {n: np.asarray(solve_nonlinear_darcy(
              K_at(n), alpha1=1.0, alpha2=1.0,
              newton_iters=16, cg_tol=1e-8, cg_maxiter=8000)[0])
          for n in (17, 33, 65)}

    def l2(a):
        return float(np.sqrt((a ** 2).mean()))

    e_coarse = l2(us[33][::2, ::2] - us[17])
    e_fine = l2(us[65][::2, ::2] - us[33])
    order = np.log2(e_coarse / e_fine)
    assert e_fine < e_coarse          # errors shrink under refinement
    assert 0.7 < order < 1.3          # first-order rate (measured 0.88)
