"""Spatial (domain-decomposition) parallelism on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

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
