"""Coverage for less-traveled paths: ConvTranspose transitions, output
activations, zero-noise prediction, off-grid FC loss, channelized MLE."""

import jax
import jax.numpy as jnp
import numpy as np

from pde_surrogate_tpu.data.grf import sample_kle
from pde_surrogate_tpu.models.codec import DenseED, Transition, activation
from pde_surrogate_tpu.models.glow import MultiScaleCondGlow
from pde_surrogate_tpu.ops.darcy import mixed_residual_fc


def test_transition_convtranspose_path():
    """upsample=None uses ConvTranspose k3s2 with output_padding=1 (doubles
    resolution, models/codec.py:139-142)."""
    m = Transition(out_features=8, down=False, upsample=None)
    x = jnp.zeros((2, 8, 8, 16))
    vs = m.init(jax.random.key(0), x, train=False)
    y = m.apply(vs, x, train=False)
    assert y.shape == (2, 16, 16, 8)


def test_dense_ed_out_activation():
    m = DenseED(1, 3, imsize=16, blocks=[1, 1, 1], growth_rate=4,
                init_features=8, out_activation="sigmoid")
    x = jnp.zeros((1, 16, 16, 1))
    vs = m.init(jax.random.key(0), x, train=False)
    y = m.apply(vs, x, train=False)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_activation_table():
    for name in ("tanh", "relu", "lrelu", "sigmoid", "softplus"):
        fn = activation(name)
        out = fn(jnp.asarray([-1.0, 0.0, 1.0]))
        assert out.shape == (3,)
    # torch Softplus(beta=4): softplus(4x)/4
    sp = activation("softplus")
    np.testing.assert_allclose(float(sp(jnp.asarray(0.0))),
                               np.log(2.0) / 4.0, rtol=1e-6)
    try:
        activation("nope")
        assert False
    except ValueError:
        pass


def test_glow_approx_pred_mean():
    model = MultiScaleCondGlow(img_size=16, x_channels=1, y_channels=3,
                               enc_blocks=[2, 2], flow_blocks=[2, 2])
    x = jnp.asarray(sample_kle(2, 16, 16, rng=0)[..., None])
    y0 = jnp.zeros((2, 16, 16, 3))
    vs = model.init(jax.random.key(0), y0, x, train=False)
    out, logp = model.apply(vs, x, train=False,
                            method=model.approx_pred_mean,
                            mutable=["batch_stats"])[0]
    assert out.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    # zero-noise generation is deterministic
    out2, _ = model.apply(vs, x, train=False, method=model.approx_pred_mean,
                          mutable=["batch_stats"])[0]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_mixed_residual_fc_off_grid():
    """Off-grid collocation interpolates K at the points."""
    def f(params, pts):
        u = 1.0 - pts[:, 1:2]
        return jnp.concatenate([u, jnp.zeros_like(u), jnp.ones_like(u)], 1)

    n = 16
    K_grid = jnp.ones((n * n, 1))
    pts = jnp.asarray(np.random.default_rng(0).random((40, 2)), jnp.float32)
    loss = mixed_residual_fc(f, None, pts, K_grid, rand_colloc=True, imsize=n)
    assert float(loss) < 1e-10  # exact solution, K==1 everywhere


def test_mle_channelized_cli(tmp_path):
    from pde_surrogate_tpu.cli.train_codec_max_likelihood import main
    state, logger = main([
        "--data-dir", str(tmp_path / "d"), "--exp-dir", str(tmp_path / "e"),
        "--no-plot", "--data", "channelized", "--ntrain", "16", "--ntest",
        "8", "--batch-size", "8", "--test-batch-size", "8", "--imsize", "16",
        "--epochs", "1", "--blocks", "1,1,1", "--growth-rate", "4",
        "--init-features", "8"])
    assert np.isfinite(logger["loss_train"]).all()
