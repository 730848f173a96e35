"""Pallas kernel tests (interpreter mode on CPU; compiled path covered by
the TPU benchmarks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pde_surrogate_tpu.data.grf import sample_kle
from pde_surrogate_tpu.ops.kernels.cg_darcy import solve_darcy_pallas
from pde_surrogate_tpu.solvers.fd_darcy import solve_darcy


@pytest.mark.parametrize("fields_per_program", [1, 2])
def test_pallas_cg_matches_xla(rng, fields_per_program):
    n = 16
    K = jnp.asarray(sample_kle(2, n, 32, rng=rng))
    u_pal = np.asarray(solve_darcy_pallas(K, n_iter=400,
                                          fields_per_program=fields_per_program,
                                          interpret=True))
    for b in range(2):
        u_ref = np.asarray(solve_darcy(K[b]))
        np.testing.assert_allclose(u_pal[b], u_ref, atol=5e-5)


def test_pallas_cg_constant_k():
    n = 16
    K = jnp.ones((3, n, n))
    u = np.asarray(solve_darcy_pallas(K, n_iter=200, fields_per_program=3,
                                      interpret=True))
    x = np.linspace(0, 1, n)
    for b in range(3):
        np.testing.assert_allclose(u[b], np.tile(1 - x, (n, 1)), atol=1e-5)


def test_pallas_cg_channelized_contrast(rng):
    """Convergence guard at channelized contrast (K ratio 100, the hardest
    family): the fixed-iteration PCG must match a tol-1e-8 XLA solve.

    n_iter scales with grid size; 384 at n=16 corresponds to the production
    1536 at n=64 (CG iterations grow ~linearly with 1/h).  The compiled
    64x64 path is measured on TPU in docs/RESULTS.md (rel err vs tol-1e-8
    XLA CG on 64 channelized fields).
    """
    from pde_surrogate_tpu.data.grf import sample_channelized
    from pde_surrogate_tpu.solvers.fd_darcy import solve_darcy_batch

    n = 16
    K = jnp.asarray(sample_channelized(2, n, rng=rng))  # k_low/k_high = 0.01/1
    assert float(K.max() / K.min()) == pytest.approx(100.0)
    u_pal = np.asarray(solve_darcy_pallas(K, n_iter=384, interpret=True))
    u_ref = np.asarray(solve_darcy_batch(K, tol=1e-8))[:, 0]  # u channel
    err = (np.linalg.norm((u_pal - u_ref).reshape(2, -1), axis=1)
           / np.linalg.norm(u_ref.reshape(2, -1), axis=1))
    assert err.max() < 1e-4, err


def test_auto_fields_per_program_vmem_bound():
    """Autosized field count keeps the kernel's ~17 live (f*n, n) f32
    buffers inside the 12 MiB budget (16 MiB scoped VMEM minus headroom);
    16-at-128 measurably overflowed on v5e (logs/canon_kle512_im128_300ep.log).
    """
    from pde_surrogate_tpu.ops.kernels.cg_darcy import _auto_fields_per_program

    assert _auto_fields_per_program(64) == 16
    assert _auto_fields_per_program(128) == 8
    assert _auto_fields_per_program(256) == 2
    for n in (16, 32, 64, 128, 256, 512):
        f = _auto_fields_per_program(n)
        assert f >= 1
        assert f == 1 or 17 * f * n * n * 4 <= 12 * 2**20


def test_pallas_cg_pad_remainder(rng):
    """Batch not divisible by fields_per_program pads then truncates."""
    n = 16
    K = jnp.asarray(sample_kle(3, n, 32, rng=rng))
    u = np.asarray(solve_darcy_pallas(K, n_iter=300, fields_per_program=2,
                                      interpret=True))
    assert u.shape == (3, n, n)
    u_ref = np.asarray(solve_darcy(K[2]))
    np.testing.assert_allclose(u[2], u_ref, atol=5e-5)
