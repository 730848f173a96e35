"""Shape/structure tests for DenseED, Decoder, and CPPN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_surrogate_tpu.models.codec import (
    DenseED, Decoder, module_size, upsample_bilinear, upsample_nearest)
from pde_surrogate_tpu.models.cppn import CPPN, ResCPPN, fc_model_size


@pytest.mark.parametrize(
    "imsize", [32, pytest.param(64, marks=pytest.mark.slow)])
@pytest.mark.parametrize("upsample", ["nearest", "bilinear"])
def test_dense_ed_shapes(imsize, upsample):
    model = DenseED(in_channels=1, out_channels=3, imsize=imsize,
                    blocks=[3, 4, 3], growth_rate=8, init_features=16,
                    upsample=upsample)
    x = jnp.zeros((2, imsize, imsize, 1))
    # shape-only check: eval_shape traces without an XLA compile
    y = jax.eval_shape(
        lambda k, x: model.apply(model.init(k, x, train=False), x,
                                 train=False), jax.random.key(0), x)
    assert y.shape == (2, imsize, imsize, 3)


@pytest.mark.slow
def test_dense_ed_odd_imsize():
    """Odd image sizes use in-conv padding 2 (models/codec.py:238-243)."""
    model = DenseED(1, 3, imsize=65, blocks=[3, 4, 3], growth_rate=8,
                    init_features=16)
    x = jnp.zeros((1, 65, 65, 1))
    # 65 -> (65+4-7)//2+1 = 32 after in-conv; decoder mirrors to 64.
    y = jax.eval_shape(
        lambda k, x: model.apply(model.init(k, x, train=False), x,
                                 train=False), jax.random.key(0), x)
    assert y.shape[1] in (64, 65, 66)  # reference emits 64 for 65 input


@pytest.mark.slow
def test_dense_ed_reference_size():
    """The north-star config (blocks [6,8,6], K=16, init 48) reproduces the
    reference's exact parameter count: torch prints '# params 740091,
    # conv layers 28' at construction (models/codec.py:292-293)."""
    model = DenseED(1, 3, imsize=64, blocks=[6, 8, 6])
    x = jnp.zeros((1, 64, 64, 1))
    # module_size only needs leaf shapes — eval_shape skips the compile
    variables = jax.eval_shape(
        lambda k, x: model.init(k, x, train=False),  # train kept static
        jax.random.key(0), x)
    n_params, n_conv = module_size(variables["params"])
    assert n_conv == 28
    assert n_params == 740091


def test_dense_ed_train_updates_batch_stats():
    model = DenseED(1, 3, imsize=32, blocks=[2, 2, 2], growth_rate=4,
                    init_features=8)
    x = jnp.ones((4, 32, 32, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    y, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    assert y.shape == (4, 32, 32, 3)
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


@pytest.mark.slow
def test_decoder_shapes():
    model = Decoder(dim_latent=1, out_channels=3, blocks=[8, 6])
    z = jnp.zeros((1, 16, 16, 1))
    y = jax.eval_shape(
        lambda k, z: model.apply(model.init(k, z, train=False), z,
                                 train=False), jax.random.key(0), z)
    assert y.shape == (1, 64, 64, 3)  # 16 -> 32 (transup) -> 64 (head)


def test_upsample_nearest_exact():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upsample_nearest(x)
    expect = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])
    np.testing.assert_allclose(np.asarray(y)[0, :, :, 0], expect)


def test_upsample_bilinear_align_corners():
    """align_corners=True: corners map to corners exactly."""
    x = jnp.asarray(np.random.default_rng(0).random((1, 8, 8, 2)),
                    jnp.float32)
    y = upsample_bilinear(x)
    assert y.shape == (1, 16, 16, 2)
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0], np.asarray(x)[0, 0, 0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(y)[0, -1, -1],
                               np.asarray(x)[0, -1, -1], atol=1e-6)


def test_cppn_shapes_and_size():
    model = CPPN(dim_in=2, dim_out=3, dim_hidden=64, layers_hidden=4)
    x = jnp.zeros((16, 2))
    params = model.init(jax.random.key(0), x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == (16, 3)
    n_params, n_fc = fc_model_size(params)
    # fc0 (no bias) + 3 hidden (kernel+bias) + out (kernel+bias)
    assert n_fc == 1 + 3 * 2 + 2
    assert params["fc0"].get("bias") is None


def test_res_cppn_shapes():
    model = ResCPPN(dim_in=2, dim_out=1, dim_hidden=64, res_layers=3)
    x = jnp.zeros((16, 2))
    variables = model.init(jax.random.key(0), x)
    assert model.apply(variables, x).shape == (16, 1)




class TestSharedStats:
    """The shared-BN-stats dense-block path (DenseED(shared_stats=True)):
    same variable tree as the default, same outputs/grads/stat updates to
    float tolerance — the only difference is WHERE batch moments are reduced
    (once per produced group vs once per consuming layer)."""

    def _pair(self, dtype=None):
        kw = dict(in_channels=1, out_channels=3, imsize=32, blocks=[3, 4, 3],
                  growth_rate=8, init_features=16, dtype=dtype)
        return DenseED(**kw), DenseED(**kw, shared_stats=True)

    def test_variable_tree_identical(self):
        ref, shared = self._pair()
        x = jnp.zeros((2, 32, 32, 1))
        v1 = jax.eval_shape(lambda k, x: ref.init(k, x, train=False),
                            jax.random.key(0), x)
        v2 = jax.eval_shape(lambda k, x: shared.init(k, x, train=False),
                            jax.random.key(0), x)
        assert (jax.tree_util.tree_structure(v1)
                == jax.tree_util.tree_structure(v2))
        for a, b in zip(jax.tree_util.tree_leaves(v1),
                        jax.tree_util.tree_leaves(v2)):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_train_forward_and_stats_match(self):
        ref, shared = self._pair()
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(4, 32, 32, 1)).astype(np.float32))
        variables = ref.init(jax.random.key(1), x, train=False)
        y1, m1 = ref.apply(variables, x, train=True, mutable=["batch_stats"])
        y2, m2 = shared.apply(variables, x, train=True,
                              mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=2e-5, atol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(m1["batch_stats"]),
                        jax.tree_util.tree_leaves(m2["batch_stats"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_eval_forward_matches(self):
        ref, shared = self._pair()
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 32, 32, 1)).astype(np.float32))
        variables = ref.init(jax.random.key(2), x, train=False)
        # advance running stats one step so eval isn't trivially zeros/ones
        _, m = ref.apply(variables, x, train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"], **m}
        y1 = ref.apply(variables, x, train=False)
        y2 = shared.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=2e-5, atol=2e-5)


    def test_gradients_match(self):
        ref, shared = self._pair()
        x = jnp.asarray(np.random.default_rng(2).normal(
            size=(4, 32, 32, 1)).astype(np.float32))
        variables = ref.init(jax.random.key(3), x, train=False)

        def loss(params, model):
            y, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.mean(y ** 2)

        g1 = jax.grad(loss)(variables["params"], ref)
        g2 = jax.grad(loss)(variables["params"], shared)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-6)

    def test_bf16_forward_close(self):
        ref, shared = self._pair(dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.default_rng(3).normal(
            size=(2, 32, 32, 1)).astype(np.float32))
        variables = ref.init(jax.random.key(4), x, train=False)
        y1, _ = ref.apply(variables, x, train=True, mutable=["batch_stats"])
        y2, _ = shared.apply(variables, x, train=True,
                             mutable=["batch_stats"])
        assert y1.dtype == y2.dtype == jnp.float32  # heads cast back to f32
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=2e-2, atol=2e-2)

    def test_bf16_gradients_compute_and_close(self):
        """bf16 train step must differentiate (round-4 probe crash: the
        preferred_element_type=f32 partial convs built a mixed-dtype conv
        in the VJP) and stay close to the concat impl's bf16 gradients."""
        ref, shared = self._pair(dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.default_rng(4).normal(
            size=(2, 32, 32, 1)).astype(np.float32))
        variables = ref.init(jax.random.key(5), x, train=False)

        def loss(params, model):
            y, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.mean(y.astype(jnp.float32) ** 2)

        g1 = jax.grad(loss)(variables["params"], ref)
        g2 = jax.grad(loss)(variables["params"], shared)
        a = np.concatenate([np.asarray(v).ravel() for v in
                            jax.tree_util.tree_leaves(g1)])
        b = np.concatenate([np.asarray(v).ravel() for v in
                            jax.tree_util.tree_leaves(g2)])
        assert np.isfinite(a).all() and np.isfinite(b).all()
        # measured impl-noise level ~0.005 (same as shared-stats); the
        # pre-fix rounding-per-partial variant sat at 0.103
        rel = np.linalg.norm(a - b) / np.linalg.norm(a)
        assert rel < 0.05, f"bf16 gradient rel-L2 {rel:.3f}"

    def test_bottleneck_rejected(self):
        model = DenseED(1, 3, imsize=32, blocks=[3, 4, 3], growth_rate=8,
                        init_features=16, bottleneck=True, shared_stats=True)
        x = jnp.zeros((2, 32, 32, 1))
        with pytest.raises(ValueError, match="bottleneck"):
            jax.eval_shape(lambda k, x: model.init(k, x, train=False),
                           jax.random.key(0), x)


class TestConcatFree(TestSharedStats):
    """The concat-free dense block (DenseED(shared_stats=True,
    concat_free=True)): groupwise norm slices + sum-of-sliced-kernel convs
    — the concatenated prefix tensor never materializes (round-4 attack on
    the 23.7% concatenate/copy trace share).  Inherits the full
    shared-stats equivalence suite (variable tree, train/eval forwards,
    batch stats, gradients, bf16) run against the concat-free model.
    """

    def _pair(self, dtype=None):
        kw = dict(in_channels=1, out_channels=3, imsize=32, blocks=[3, 4, 3],
                  growth_rate=8, init_features=16, dtype=dtype)
        return DenseED(**kw), DenseED(**kw, shared_stats=True,
                                      concat_free=True)



class TestRemat:
    """DenseED(remat=True): per-block activation rematerialization
    (VERDICT r4 item 7 — the bandwidth-for-FLOPs trade).  Must be a pure
    scheduling change: identical variable tree, forward, and gradients."""

    def _pair(self):
        kw = dict(in_channels=1, out_channels=3, imsize=16, blocks=[2, 3, 2],
                  growth_rate=4, init_features=8, shared_stats=True)
        return DenseED(**kw), DenseED(**kw, remat=True)

    def test_tree_and_forward_identical(self):
        ref, rem = self._pair()
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 1))
        v = ref.init(jax.random.key(1), x, train=True)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(
                    jax.eval_shape(lambda k, x: rem.init(k, x, train=True),
                                   jax.random.key(1), x)))
        y0, s0 = ref.apply(v, x, train=True, mutable=["batch_stats"])
        y1, s1 = rem.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
        for a, b in zip(jax.tree_util.tree_leaves(s0),
                        jax.tree_util.tree_leaves(s1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_gradients_match(self):
        ref, rem = self._pair()
        x = jax.random.normal(jax.random.key(2), (2, 16, 16, 1))
        v = ref.init(jax.random.key(1), x, train=True)

        def loss(params, model):
            y, _ = model.apply({"params": params,
                                "batch_stats": v["batch_stats"]},
                               x, train=True, mutable=["batch_stats"])
            return jnp.mean(y ** 2)

        g0 = jax.grad(loss)(v["params"], ref)
        g1 = jax.grad(loss)(v["params"], rem)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
