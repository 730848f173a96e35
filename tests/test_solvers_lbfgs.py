"""L-BFGS machinery + sampler/LHS units + solver-loss integration."""

import jax
import jax.numpy as jnp
import numpy as np

from pde_surrogate_tpu.models.cppn import CPPN
from pde_surrogate_tpu.ops.darcy import mixed_residual_fc
from pde_surrogate_tpu.ops.lhs import lhs
from pde_surrogate_tpu.ops.sampling import SampleSpatial2d
from pde_surrogate_tpu.train.lbfgs import lbfgs_optimizer, make_lbfgs_epoch


def test_lbfgs_solves_quadratic():
    """min ||A x - b||^2 reaches the least-squares solution."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((20, 5)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((20,)), jnp.float32)

    def loss(x):
        r = A @ x - b
        return jnp.sum(r * r)

    opt = lbfgs_optimizer(learning_rate=None)  # zoom-linesearch variant
    x = jnp.zeros(5)
    opt_state = opt.init(x)
    epoch = make_lbfgs_epoch(loss, opt, iters_per_epoch=25)
    x, opt_state, final = epoch(x, opt_state)
    x_star, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)
    np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-4)


def test_lbfgs_trains_tiny_pinn():
    """A few L-BFGS epochs reduce the physics loss of a small CPPN."""
    model = CPPN(dim_in=2, dim_out=3, dim_hidden=32, layers_hidden=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, 2)))["params"]

    def model_fn(p, pts):
        return model.apply({"params": p}, pts)

    pts = jnp.asarray(np.random.default_rng(1).random((64, 2)), jnp.float32)
    K = jnp.ones((64, 1), jnp.float32)

    def loss(p):
        return mixed_residual_fc(model_fn, p, pts, K)

    opt = lbfgs_optimizer(learning_rate=0.5)  # torch-style fixed step
    opt_state = opt.init(params)
    epoch = make_lbfgs_epoch(loss, opt, iters_per_epoch=10,
                             with_linesearch=False)
    l0 = float(loss(params))
    for _ in range(3):
        params, opt_state, last = epoch(params, opt_state)
    assert float(last) < l0


def test_sampler_shapes_and_ranges():
    s = SampleSpatial2d(16, 16, rng=0)
    c = s.colloc(on_grid=True)
    assert c.shape == (256, 2) and c.min() >= 0 and c.max() <= 1
    nb = s.colloc(on_grid=True, no_boundary=True)
    assert nb.shape == (196, 2)
    assert nb.min() > 0 and nb.max() < 1
    off = s.colloc(on_grid=False, n_samples=77)
    assert off.shape == (77, 2)
    left = s.left(on_grid=True)
    np.testing.assert_allclose(left[:, 1], 0.0)
    right = s.right(on_grid=False, n_samples=9)
    np.testing.assert_allclose(right[:, 1], 1.0)
    top = s.top()
    np.testing.assert_allclose(top[:, 0], 0.0)
    bottom = s.bottom()
    np.testing.assert_allclose(bottom[:, 0], 1.0)


def test_lhs_criteria():
    for crit in (None, "center", "maximin", "centermaximin", "correlation"):
        h = lhs(3, samples=17, criterion=crit, rng=5)
        assert h.shape == (17, 3)
        assert h.min() >= 0 and h.max() <= 1
        # latin property: one sample per 1/17 stratum per dim
        for j in range(3):
            strata = np.floor(h[:, j] * 17).astype(int)
            assert len(np.unique(strata)) == 17
    # reproducible from the seed
    np.testing.assert_array_equal(lhs(2, 9, rng=3), lhs(2, 9, rng=3))


def test_lbfgs_epoch_reports_returned_params_loss():
    """The epoch's reported loss must be loss(returned params), not the
    value cached before the final update — otherwise a blowup inside the
    last iterate pairs a good loss with garbage params and breaks the
    drivers' restart-from-best divergence guards."""

    def loss(x):
        return jnp.sum(x * x)

    opt = lbfgs_optimizer(learning_rate=None)
    x = jnp.ones(3)
    opt_state = opt.init(x)
    epoch = make_lbfgs_epoch(loss, opt, iters_per_epoch=5)
    x, opt_state, reported = epoch(x, opt_state)
    np.testing.assert_allclose(float(reported), float(loss(x)), rtol=1e-6)
