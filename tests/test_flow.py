"""Unit + consistency tests for the conditional Glow stack.

The strongest check: log p(y|x) computed on the generation path (generate)
must agree with the density-evaluation path (forward, y -> z) on the same
y — this exercises every layer's forward/reverse pair and every logdet sign
in one assertion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_surrogate_tpu.models.flow import (
    ActNorm, AffineCouplingLayer, InvConv1x1, InvConv1x1LU, Split, Squeeze,
    actnorm_stats_to_params, gaussian_diag)
from pde_surrogate_tpu.models.glow import (
    MultiScaleCondGlow, encoder_feature_sizes, glow_z_shapes)


def _x(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32)


def test_actnorm_roundtrip_and_logdet():
    m = ActNorm(4)
    x = _x((2, 8, 8, 4))
    vs = m.init(jax.random.key(0), x)
    # nudge away from identity
    vs = {"params": {"weight": jnp.asarray([0.5, 2.0, 1.5, 0.3]),
                     "bias": jnp.asarray([0.1, -0.2, 0.0, 1.0])}}
    y, ld = m.apply(vs, x)
    x2, ld_r = m.apply(vs, y, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    expect = np.sum(np.log(np.abs([0.5, 2.0, 1.5, 0.3]))) * 64
    np.testing.assert_allclose(float(ld), expect, rtol=1e-5)
    np.testing.assert_allclose(float(ld_r), expect, rtol=1e-5)


def test_actnorm_data_init():
    """Data-init makes the output zero-mean unit-variance per channel."""
    m = ActNorm(3)
    x = _x((16, 8, 8, 3)) * jnp.asarray([3.0, 0.5, 1.0]) + 2.0
    vs = m.init(jax.random.key(0), x)
    _, stats = m.apply(vs, x, mutable=["actnorm_stats"])
    params = actnorm_stats_to_params(stats["actnorm_stats"], vs["params"])
    y, _ = m.apply({"params": params}, x)
    y = np.asarray(y).reshape(-1, 3)
    np.testing.assert_allclose(y.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(0), 1.0, atol=1e-3)


@pytest.mark.parametrize("cls", [InvConv1x1, InvConv1x1LU])
@pytest.mark.parametrize("train_sampling", [True, False])
def test_invconv_roundtrip_and_logdet(cls, train_sampling):
    c = 8
    m = cls(c, train_sampling=train_sampling)
    x = _x((2, 4, 4, c))
    vs = m.init(jax.random.key(1), x)
    z, ld_f = m.apply(vs, x)
    x2, ld_r = m.apply(vs, z, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    # forward and reverse logdets are negatives of each other (same applied-
    # matrix magnitude, opposite accounting convention)
    np.testing.assert_allclose(float(ld_f), -float(ld_r), rtol=1e-4,
                               atol=1e-4)
    # |logdet| = H*W*|log|det W|| with W from the params
    if cls is InvConv1x1:
        w = vs["params"]["weight"]
        _, logabs = np.linalg.slogdet(np.asarray(w))
        np.testing.assert_allclose(abs(float(ld_f)), 16 * abs(logabs),
                                   atol=1e-3)
    else:
        ld0 = float(jnp.sum(vs["params"]["log_s"])) * 16
        np.testing.assert_allclose(abs(float(ld_f)), abs(ld0), rtol=1e-4,
                                   atol=1e-4)


def test_invconv_lu_weight_is_orthogonal_at_init():
    """QR init: the composed P L U is a rotation => |det| = 1, log_s sums ~ 0."""
    m = InvConv1x1LU(6)
    x = _x((1, 4, 4, 6))
    vs = m.init(jax.random.key(2), x)
    z, _ = m.apply(vs, x)
    # rotation preserves norms channel-wise-combined
    np.testing.assert_allclose(float(jnp.sum(z ** 2)),
                               float(jnp.sum(x ** 2)), rtol=1e-4)


def test_coupling_roundtrip():
    m = AffineCouplingLayer(6)
    x = _x((2, 8, 8, 6))
    cond = _x((2, 8, 8, 5), seed=3)
    vs = m.init(jax.random.key(0), x, cond)
    y, ld = m.apply(vs, x, cond, train=False,
                    mutable=["batch_stats"])[0]
    x2, ld2 = m.apply(vs, y, cond, reverse=True, train=False,
                      mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld2), atol=1e-5)
    assert ld.shape == (2,)


def test_coupling_odd_channels():
    """3-channel input: x1 keeps 2 channels (torch chunk semantics)."""
    m = AffineCouplingLayer(3)
    x = _x((2, 8, 8, 3))
    cond = _x((2, 8, 8, 4), seed=5)
    vs = m.init(jax.random.key(0), x, cond)
    y, _ = m.apply(vs, x, cond, train=False, mutable=["batch_stats"])[0]
    assert y.shape == x.shape
    # x1 (first 2 channels) passes through unchanged
    np.testing.assert_allclose(np.asarray(y[..., :2]),
                               np.asarray(x[..., :2]), atol=1e-6)


def test_squeeze_roundtrip():
    sq = Squeeze(2)
    x = _x((2, 8, 8, 3))
    y = sq(x)
    assert y.shape == (2, 4, 4, 12)
    x2 = sq(y, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=0)


def test_split_roundtrip():
    m = Split(8)
    z = _x((2, 4, 4, 8))
    vs = m.init(jax.random.key(0), z)
    z1, lp, eps = m.apply(vs, z, return_eps=True)
    assert z1.shape == (2, 4, 4, 4) and lp.shape == (2,)
    # reverse with the recovered eps reconstructs z exactly
    z_rec, lp_rec = m.apply(vs, z1, reverse=True, eps=eps)
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_rec), atol=1e-4)


def test_gaussian_diag_logprob_matches_scipy():
    mean = _x((2, 3, 3, 2))
    log_std = _x((2, 3, 3, 2), seed=7) * 0.1
    g = gaussian_diag(mean, log_std)
    x = _x((2, 3, 3, 2), seed=8)
    from scipy.stats import norm
    expect = norm.logpdf(np.asarray(x), np.asarray(mean),
                         np.exp(np.asarray(log_std))).reshape(2, -1).sum(1)
    np.testing.assert_allclose(np.asarray(g.log_prob(x)), expect, rtol=1e-4)


def test_z_shapes_and_encoder_sizes():
    # reference worked example: imsize 32, y=3, flow [6,6,6], f=2
    zs = glow_z_shapes(32, 3, [6, 6, 6])
    assert zs == [(16, 16, 6), (8, 8, 24)]
    # encoder [3,4,4], growth 16, init 48: 80 @ /1, 104 @ /2, 116 @ /4
    assert encoder_feature_sizes(1, [3, 4, 4]) == [80, 104, 116]


def _tiny_glow():
    return MultiScaleCondGlow(img_size=16, x_channels=1, y_channels=3,
                              enc_blocks=[2, 2, 2], flow_blocks=[2, 2, 2])


def test_glow_config_validation():
    import pytest as _pytest
    x = _x((1, 12, 12, 1))
    y = _x((1, 12, 12, 3))
    bad_len = MultiScaleCondGlow(img_size=12, x_channels=1, y_channels=3,
                                 enc_blocks=[2, 2, 2], flow_blocks=[2, 2])
    with _pytest.raises(ValueError, match="equal length"):
        bad_len.init(jax.random.key(0), y, x, train=False)
    bad_size = MultiScaleCondGlow(img_size=12, x_channels=1, y_channels=3,
                                  enc_blocks=[2, 2, 2, 2],
                                  flow_blocks=[2, 2, 2, 2])
    with _pytest.raises(ValueError, match="divisible"):
        bad_size.init(jax.random.key(0), y, x, train=False)
    # non-square: BOTH dims must divide (min-dim-only check used to pass 24)
    bad_rect = MultiScaleCondGlow(img_size=[16, 24], x_channels=1,
                                  y_channels=3, enc_blocks=[2, 2, 2, 2, 2],
                                  flow_blocks=[2, 2, 2, 2, 2])
    with _pytest.raises(ValueError, match="BOTH"):
        bad_rect.init(jax.random.key(0), _x((1, 16, 24, 3)),
                      _x((1, 16, 24, 1)), train=False)
    bad_factor = MultiScaleCondGlow(img_size=16, x_channels=1, y_channels=3,
                                    enc_blocks=[2, 2], flow_blocks=[2, 2],
                                    squeeze_factor=4)
    with _pytest.raises(ValueError, match="squeeze_factor"):
        bad_factor.init(jax.random.key(0), _x((1, 16, 16, 3)),
                        _x((1, 16, 16, 1)), train=False)


@pytest.mark.slow
def test_glow_eps_list_length_guard():
    """A wrong-length eps_list fails loudly (reference asserts this) instead
    of an opaque shape error deep in the reverse flow."""
    import pytest as _pytest
    model = _tiny_glow()
    x = _x((2, 16, 16, 1))
    y0 = _x((2, 16, 16, 3), seed=1)
    vs = model.init(jax.random.key(0), y0, x, train=False)
    good = model.apply(vs, 2, method=model.create_zero_noise)
    assert len(good) == 2  # len(flow_blocks) - 1
    with _pytest.raises(ValueError, match="eps_list"):
        model.apply(vs, x, eps_list=good[:1], train=False,
                    method=model.generate, mutable=["batch_stats"])
    with _pytest.raises(ValueError, match="needs key"):
        model.apply(vs, x, 3, train=False, method=model.sample,
                    mutable=["batch_stats"])


def test_glow_multichannel_x():
    """x_channels=2: encoder channel bookkeeping must match the actual
    concat widths (silent drift regression)."""
    model = MultiScaleCondGlow(img_size=16, x_channels=2, y_channels=3,
                               enc_blocks=[2, 2, 2], flow_blocks=[2, 2, 2])
    x = _x((2, 16, 16, 2))
    y0 = _x((2, 16, 16, 3), seed=1)
    vs = model.init(jax.random.key(0), y0, x, train=False)
    y, logp = model.apply(vs, x, key=jax.random.key(1), train=False,
                          method=model.generate, mutable=["batch_stats"])[0]
    assert y.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(logp)).all()


def test_glow_generate_forward_consistency():
    """log p(y|x) from the generation path == density evaluation of the
    generated y.  Exercises every forward/reverse pair and logdet sign."""
    model = _tiny_glow()
    x = _x((2, 16, 16, 1))
    y0 = _x((2, 16, 16, 3), seed=1)
    vs = model.init(jax.random.key(0), y0, x, train=False)

    y, logp_gen = model.apply(vs, x, key=jax.random.key(42), train=False,
                              method=model.generate,
                              mutable=["batch_stats"])[0]
    assert y.shape == (2, 16, 16, 3)
    z, logp_fwd, _ = model.apply(vs, y, x, train=False,
                                 mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(logp_gen), np.asarray(logp_fwd),
                               rtol=2e-3, atol=0.5)


@pytest.mark.slow
def test_glow_sample_shapes():
    model = _tiny_glow()
    x = _x((2, 16, 16, 1))
    y0 = _x((2, 16, 16, 3), seed=1)
    vs = model.init(jax.random.key(0), y0, x, train=False)
    samples = model.apply(vs, x, 4, jax.random.key(1), train=False,
                          method=model.sample, mutable=["batch_stats"])[0]
    assert samples.shape == (4, 2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(samples)))
    # different samples differ
    assert float(jnp.abs(samples[0] - samples[1]).max()) > 1e-4


def test_glow_forward_roundtrip_via_eps():
    """forward with return_eps, then generate with those eps reconstructs y."""
    model = _tiny_glow()
    x = _x((2, 16, 16, 1))
    y = _x((2, 16, 16, 3), seed=9) * 0.3
    vs = model.init(jax.random.key(0), y, x, train=False)
    z, logp, eps_list = model.apply(vs, y, x, return_eps=True, train=False,
                                    mutable=["batch_stats"])[0]
    # eps ordering: splits bottom-up then top; generate takes the same list
    y_rec, logp_gen = model.apply(vs, x, eps_list, None, False, 1.0,
                                  method=model.generate,
                                  mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y), atol=1e-3)
    np.testing.assert_allclose(np.asarray(logp_gen), np.asarray(logp),
                               rtol=2e-3, atol=0.5)
