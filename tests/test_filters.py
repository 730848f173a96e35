"""Golden tests for the matmul-stencil Sobel filter.

Oracle: direct numpy replicate-pad cross-correlation with the reference
kernels (utils/image_gradient.py:28-47) followed by the explicit modifier
matmul — computed without any of the production code paths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pde_surrogate_tpu.ops.filters import SobelFilter, FourierFilter, GaussianFilter


def _np_corr2d_replicate(img, kernel):
    """Replicate-pad 2-D cross-correlation (conv2d semantics), numpy oracle."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    padded = np.pad(img, ((ph, ph), (pw, pw)), mode="edge")
    out = np.zeros_like(img, dtype=np.float64)
    h, w = img.shape
    for i in range(kh):
        for j in range(kw):
            out += kernel[i, j] * padded[i:i + h, j:j + w]
    return out


def _ref_kernels(filter_size):
    if filter_size == 3:
        h = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.float64) / 8
        return h.T, h  # (VSOBEL for grad_h, HSOBEL for grad_v)
    v = np.array([[-5, -4, 0, 4, 5],
                  [-8, -10, 0, 10, 8],
                  [-10, -20, 0, 20, 10],
                  [-8, -10, 0, 10, 8],
                  [-5, -4, 0, 4, 5]], dtype=np.float64) / 240
    return v, v.T


def _modifier(n):
    m = np.eye(n)
    m[0:2, 0] = [4, -1]
    m[-2:, -1] = [-1, 4]
    return m


def _oracle_grad(img, filter_size, direction, correct):
    n = img.shape[-1]
    vk, hk = _ref_kernels(filter_size)
    if direction == "h":
        g = _np_corr2d_replicate(img, vk) * img.shape[1]
        return g @ _modifier(n) if correct else g
    g = _np_corr2d_replicate(img, hk) * img.shape[0]
    return _modifier(n).T @ g if correct else g


@pytest.mark.parametrize("filter_size", [3, 5])
@pytest.mark.parametrize("correct", [True, False])
@pytest.mark.parametrize("imsize", [32, 64, 65])
def test_sobel_matches_oracle(rng, filter_size, correct, imsize):
    img = rng.standard_normal((imsize, imsize))
    sob = SobelFilter(imsize, correct=correct)
    gh = np.asarray(sob.grad_h(jnp.asarray(img, dtype=jnp.float32), filter_size))
    gv = np.asarray(sob.grad_v(jnp.asarray(img, dtype=jnp.float32), filter_size))
    np.testing.assert_allclose(gh, _oracle_grad(img, filter_size, "h", correct),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(gv, _oracle_grad(img, filter_size, "v", correct),
                               rtol=1e-4, atol=1e-3)


def test_sobel_linear_field_exact():
    """u = x on the unit square => grad_h is constant everywhere (incl. the
    corrected boundary) and grad_v == 0.

    Note the reference scales by imsize while the grid spacing is
    1/(imsize-1) (utils/image_gradient.py:69), so the constant is n/(n-1),
    not exactly 1 — a preserved reference convention.
    """
    n = 64
    expect = n / (n - 1)
    x = np.linspace(0, 1, n)
    img = jnp.asarray(np.tile(x, (n, 1)), dtype=jnp.float32)
    sob = SobelFilter(n, correct=True)
    np.testing.assert_allclose(np.asarray(sob.grad_h(img)), expect, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sob.grad_v(img)), 0.0, atol=1e-4)
    # transposed field: u = y
    np.testing.assert_allclose(np.asarray(sob.grad_v(img.T)), expect, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sob.grad_h(img.T)), 0.0, atol=1e-4)


def test_sobel_batched_channels(rng):
    """Batched NHWC application equals per-image application."""
    imgs = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    sob = SobelFilter(32)
    batched = np.asarray(sob.grad_h(jnp.asarray(imgs)))
    for b in range(4):
        for c in range(3):
            single = np.asarray(sob.grad_h(jnp.asarray(imgs[b, :, :, c])))
            np.testing.assert_allclose(batched[b, :, :, c], single, atol=1e-4)


def test_sobel_quadratic_boundary_correction():
    """u = x^2: corrected one-sided FD at the boundary is exact for
    quadratics (3-point one-sided difference has O(h^2) error, and the
    [4, -1] corner scheme reproduces 2x at x=0 and x=1 exactly up to h^2)."""
    n = 65
    x = np.linspace(0, 1, n)
    img = jnp.asarray(np.tile(x * x, (n, 1)), dtype=jnp.float32)
    sob = SobelFilter(n, correct=True)
    gh = np.asarray(sob.grad_h(img))
    np.testing.assert_allclose(gh, np.tile(2 * x * n / (n - 1), (n, 1)),
                               atol=5e-3)


def test_fourier_filter_runs(rng):
    img = jnp.asarray(rng.standard_normal((32, 32)), dtype=jnp.float32)
    ff = FourierFilter(32)
    for fs in (3, 5, 7):
        assert ff.grad_h(img, fs).shape == (32, 32)
        assert ff.grad_v(img, fs).shape == (32, 32)
    # linear field: interior derivative ~ 1 (the Farid-Simoncelli d1 taps
    # have unit-slope response 0.9918, and the reference's imsize scaling
    # adds the n/(n-1) factor; both conventions preserved)
    x = np.linspace(0, 1, 32)
    lin = jnp.asarray(np.tile(x, (32, 1)), dtype=jnp.float32)
    gh = np.asarray(ff.grad_h(lin, 5))
    np.testing.assert_allclose(gh[:, 3:-3], 1.0, atol=3e-2)


def test_gaussian_filter_smooths(rng):
    img = jnp.asarray(rng.standard_normal((33, 33)), dtype=jnp.float32)
    gf = GaussianFilter(sigma=1.0)
    out = np.asarray(gf(img))
    assert out.shape == (33, 33)
    assert out.std() < np.asarray(img).std()
    # constant field is preserved (weights sum to 1)
    const = jnp.ones((33, 33), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(gf(const)), 1.0, atol=1e-5)
