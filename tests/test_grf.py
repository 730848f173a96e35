"""Statistical sanity of the permeability-field generators."""

import numpy as np

from pde_surrogate_tpu.data.grf import (kle_basis, norm_ppf, sample_channelized,
                                        sample_kle, sample_warped_grf)


def test_kle_basis_orthonormal_modes():
    basis = kle_basis(32, 64, 0.25)
    k, n, _ = basis.modes.shape
    flat = basis.modes.reshape(k, n * n)
    gram = flat @ flat.T / (n * n)
    np.testing.assert_allclose(gram, np.eye(k), atol=1e-8)
    # eigenvalues sorted descending and positive
    assert (np.diff(basis.eigvals) <= 1e-12).all()
    assert basis.eigvals.min() > 0


def test_kle_logk_statistics():
    """log K fields: ~zero mean, pointwise variance ~ captured energy."""
    fields = sample_kle(512, 32, 128, rng=0, use_lhs=False)
    g = np.log(fields)
    assert abs(g.mean()) < 0.05
    basis = kle_basis(32, 128, 0.25)
    captured = (basis.eigvals[:, None, None] * basis.modes ** 2).sum(0)
    var = g.var(axis=0)
    np.testing.assert_allclose(var.mean(), captured.mean(), rtol=0.15)


def test_kle_basis_keeps_true_top_products():
    """The selected 2-D eigenvalues must be exactly the n_terms largest
    lambda_i*lambda_j over the FULL n x n product grid (regression: a
    sqrt(n_terms)-sized candidate grid dropped anisotropic (0, j>m) pairs
    outranking deep-interior ones — 166 of the top 512 at n=64)."""
    n, n_terms = 64, 512
    basis = kle_basis(n, n_terms, 0.25)
    from pde_surrogate_tpu.data.grf import _exp_cov_1d
    w1 = np.linalg.eigvalsh(_exp_cov_1d(n, 0.25) / n)[::-1]
    full = np.sort(np.outer(w1, w1).ravel())[::-1][:n_terms]
    np.testing.assert_allclose(np.sort(basis.eigvals)[::-1], full, rtol=1e-10)


def test_kle_lhs_stratification():
    """LHS coefficient designs: each KLE coefficient's empirical quantiles
    are stratified (variance of a mean much lower than iid)."""
    f1 = sample_kle(64, 16, 16, rng=1, use_lhs=True)
    assert f1.shape == (64, 16, 16) and np.isfinite(f1).all()
    assert (f1 > 0).all()


def test_norm_ppf():
    from scipy.stats import norm
    p = np.array([0.01, 0.25, 0.5, 0.9, 0.999])
    np.testing.assert_allclose(norm_ppf(p), norm.ppf(p), atol=1e-10)


def test_channelized_binary_and_fraction():
    f = sample_channelized(8, 32, rng=2)
    vals = np.unique(f)
    assert len(vals) == 2
    np.testing.assert_allclose(sorted(vals), [0.01, 1.0], rtol=1e-6)
    frac = (f == 1.0).mean(axis=(1, 2))
    assert (np.abs(frac - 0.5) < 0.05).all()  # thresholded at the median


def test_warped_grf_positive_and_varied():
    f = sample_warped_grf(4, 32, rng=3)
    assert f.shape == (4, 32, 32)
    assert (f > 0).all() and np.isfinite(f).all()
    assert f.std() > 0.1
