"""Spatial (domain-decomposition) parallelism on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_surrogate_tpu.data.grf import sample_kle
from pde_surrogate_tpu.parallel.spatial import solve_darcy_spatial, spatial_mesh
from pde_surrogate_tpu.solvers.fd_darcy import solve_darcy


def test_spatial_solver_matches_single_device(rng):
    n = 32
    K = jnp.asarray(sample_kle(1, n, 64, rng=rng)[0])
    mesh = spatial_mesh(8)
    u_sp = np.asarray(solve_darcy_spatial(K, mesh, n_iter=1200))
    u_ref = np.asarray(solve_darcy(K))
    np.testing.assert_allclose(u_sp, u_ref, atol=5e-4)


@pytest.mark.slow
def test_spatial_solver_sharded_output(rng):
    n = 32
    K = jnp.asarray(sample_kle(1, n, 64, rng=rng)[0])
    mesh = spatial_mesh(4)
    u = solve_darcy_spatial(K, mesh, n_iter=600)
    # output stays sharded over the space axis
    assert len(u.sharding.device_set) == 4
    u_np = np.asarray(u)
    np.testing.assert_allclose(u_np[:, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(u_np[:, -1], 0.0, atol=1e-6)


def test_spatial_solver_batched_fields(rng):
    """A leading batch dim solves every field simultaneously with per-field
    CG scalars; each result matches its own single-device solve."""
    n, bs = 32, 3
    K = jnp.asarray(sample_kle(bs, n, 64, rng=rng))
    mesh = spatial_mesh(8)
    u_sp = np.asarray(solve_darcy_spatial(K, mesh, n_iter=1200))
    assert u_sp.shape == (bs, n, n)
    for i in range(bs):
        u_ref = np.asarray(solve_darcy(K[i]))
        np.testing.assert_allclose(u_sp[i], u_ref, atol=5e-4)


def test_spatial_solver_non_divisible_raises(rng):
    """H not divisible by the mesh axis is an explicit error, not a silent
    mis-shard."""
    K = jnp.asarray(sample_kle(1, 30, 64, rng=rng)[0])  # 30 % 8 != 0
    mesh = spatial_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        solve_darcy_spatial(K, mesh)


def test_spatial_solver_iteration_convergence(rng):
    """Fixed-iteration CG is monotone here: more iterations => closer to
    the converged single-device solution (guards against a wrong halo or
    psum that stalls or diverges the iteration)."""
    n = 32
    K = jnp.asarray(sample_kle(1, n, 64, rng=rng)[0])
    mesh = spatial_mesh(8)
    u_ref = np.asarray(solve_darcy(K))
    errs = []
    for it in (25, 100, 400):
        u = np.asarray(solve_darcy_spatial(K, mesh, n_iter=it))
        errs.append(np.max(np.abs(u - u_ref)))
    # strictly decreasing until the f32 floor (~5e-7, reached by ~400)
    assert errs[1] < errs[0]
    assert errs[2] <= errs[1]
    assert errs[2] < 5e-4


def test_spatial_solver_channelized_contrast(rng):
    """High-contrast (binary, contrast-100) fields converge too: the Jacobi
    preconditioner + harmonic faces must handle the discontinuity."""
    from pde_surrogate_tpu.data.grf import sample_channelized
    n = 32
    K = jnp.asarray(sample_channelized(1, n, rng=rng)[0])
    mesh = spatial_mesh(4)
    u_sp = np.asarray(solve_darcy_spatial(K, mesh, n_iter=3000))
    u_ref = np.asarray(solve_darcy(K))
    np.testing.assert_allclose(u_sp, u_ref, atol=2e-3)
