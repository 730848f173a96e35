"""Reverse-KL glow training step + data-init + eval + UQ facade tests."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from pde_surrogate_tpu.data.grf import sample_kle
from pde_surrogate_tpu.models.glow import MultiScaleCondGlow
from pde_surrogate_tpu.ops.filters import SobelFilter
from pde_surrogate_tpu.train.glow_trainer import (create_glow_state,
                                                  data_init_actnorm, glow_lr,
                                                  make_glow_eval_step,
                                                  make_reverse_kl_step)
from pde_surrogate_tpu.uq.uq import GlowSurrogate, UQCondGlow


def _setup(n=16, bs=8):
    x = jnp.asarray(sample_kle(bs, n, 16, rng=0)[..., None])
    y = jnp.asarray(np.random.default_rng(1).standard_normal(
        (bs, n, n, 3)).astype(np.float32) * 0.1)
    model = MultiScaleCondGlow(img_size=n, x_channels=1, y_channels=3,
                               enc_blocks=[2, 2], flow_blocks=[2, 2])
    state, tx = create_glow_state(model, jax.random.key(0), y, x,
                                  lr_max=1e-3, total_steps=20)
    return model, state, tx, x, y, n


def test_reverse_kl_step_runs_and_descends():
    model, state, tx, x, y, n = _setup()
    step = make_reverse_kl_step(model, tx, SobelFilter(n), beta=150.0,
                                weight_bound=50.0, n_out_pixels=3 * n * n)
    state, m0 = step(state, x)
    losses = [float(m0["loss"])]
    for _ in range(10):
        state, m = step(state, x)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0]
    assert int(state.step) == 11
    assert np.isfinite(glow_lr(state))


@pytest.mark.slow
def test_glow_lr_without_nan_guard():
    """glow_lr must read the lr through InjectHyperparamsState directly when
    nan_guard=False (regression: it unwrapped .inner_state once
    unconditionally, landing on the inner adam chain state)."""
    n, bs = 16, 4
    x = jnp.asarray(sample_kle(bs, n, 16, rng=0)[..., None])
    y = jnp.asarray(np.random.default_rng(1).standard_normal(
        (bs, n, n, 3)).astype(np.float32) * 0.1)
    model = MultiScaleCondGlow(img_size=n, x_channels=1, y_channels=3,
                               enc_blocks=[2, 2], flow_blocks=[2, 2])
    state, tx = create_glow_state(model, jax.random.key(0), y, x,
                                  lr_max=1e-3, total_steps=20,
                                  nan_guard=False)
    assert np.isfinite(glow_lr(state))
    step = make_reverse_kl_step(model, tx, SobelFilter(n), beta=150.0,
                                weight_bound=50.0, n_out_pixels=3 * n * n)
    state, _ = step(state, x)
    assert np.isfinite(glow_lr(state))


def test_reverse_kl_deterministic():
    """Same key + same steps = bitwise identical params (north-star:
    bitwise-stable reverse-KL training)."""
    outs = []
    for _ in range(2):
        model, state, tx, x, y, n = _setup()
        step = make_reverse_kl_step(model, tx, SobelFilter(n), 150.0, 50.0,
                                    3 * n * n)
        for _ in range(3):
            state, m = step(state, x)
        outs.append(jax.device_get(state.params))
    for a, b in zip(jax.tree_util.tree_leaves(outs[0]),
                    jax.tree_util.tree_leaves(outs[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reverse_kl_fvcg_anchor():
    """sobel_fvcg reverse-KL (round 4, the codec hybrid's CG anchors on
    every drawn sample): zero anchor weights reproduce the sobel loss
    exactly, nonzero weights add a positive finite anchor and the step
    trains."""
    model, state, tx, x, y, n = _setup()
    kw = dict(beta=150.0, weight_bound=50.0, n_out_pixels=3 * n * n)
    plain = make_reverse_kl_step(model, tx, SobelFilter(n), **kw)
    zeroed = make_reverse_kl_step(model, tx, SobelFilter(n), **kw,
                                  physics="sobel_fvcg", fvcg_weight=0.0,
                                  fvcg_flux_weight=0.0)
    anchored = make_reverse_kl_step(model, tx, SobelFilter(n), **kw,
                                    physics="sobel_fvcg", fvcg_weight=100.0,
                                    fvcg_flux_weight=1.0)
    copy = lambda s: jax.tree.map(jnp.copy, s)  # steps donate their state
    _, m_plain = plain(copy(state), x)
    _, m_zero = zeroed(copy(state), x)
    np.testing.assert_allclose(float(m_zero["loss"]), float(m_plain["loss"]),
                               rtol=1e-6)
    st, m0 = anchored(copy(state), x)
    assert float(m0["loss"]) > float(m_plain["loss"])  # anchors are norms
    losses = [float(m0["loss"])]
    for _ in range(6):
        st, m = anchored(st, x)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0]
    with pytest.raises(ValueError, match="physics"):
        make_reverse_kl_step(model, tx, SobelFilter(n), **kw, physics="bogus")


def test_reverse_kl_pure_fvcg():
    """physics='fvcg' (round 4): the pure CG-anchor objective — no Sobel
    terms at all (codec analog: ops/darcy.fv_cg_error_loss, the
    recommended recipe on discontinuous K).  Finite positive loss,
    descends, and differs from the sobel objective (error norm, not a
    stencil residual)."""
    model, state, tx, x, y, n = _setup()
    kw = dict(beta=150.0, weight_bound=50.0, n_out_pixels=3 * n * n)
    sobel = make_reverse_kl_step(model, tx, SobelFilter(n), **kw)
    pure = make_reverse_kl_step(model, tx, SobelFilter(n), **kw,
                                physics="fvcg", fvcg_iters=8)
    copy = lambda s: jax.tree.map(jnp.copy, s)
    _, m_sobel = sobel(copy(state), x)
    st, m0 = pure(copy(state), x)
    assert float(m0["loss"]) != float(m_sobel["loss"])
    losses = [float(m0["loss"])]
    for _ in range(6):
        st, m = pure(st, x)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0]


def test_forward_kl_step_descends():
    """MLE training through the density path reduces bits/pixel."""
    from pde_surrogate_tpu.train.glow_trainer import make_forward_kl_step
    n, bs = 16, 8
    x = jnp.asarray(sample_kle(bs, n, 16, rng=2)[..., None])
    y = jnp.asarray(np.random.default_rng(3).standard_normal(
        (bs, n, n, 3)).astype(np.float32) * 0.1)
    model = MultiScaleCondGlow(img_size=n, x_channels=1, y_channels=3,
                               enc_blocks=[2, 2], flow_blocks=[2, 2],
                               train_sampling=False)
    state, tx = create_glow_state(model, jax.random.key(0), y, x,
                                  lr_max=1e-3, total_steps=20)
    step = make_forward_kl_step(model, tx, 3 * n * n)
    state, m0 = step(state, x, y)
    for _ in range(8):
        state, m = step(state, x, y)
    assert float(m["bits_per_pixel"]) < float(m0["bits_per_pixel"])


def test_glow_eval_step_metrics():
    model, state, tx, x, y, n = _setup()
    ev = make_glow_eval_step(model, SobelFilter(n), 150.0, 50.0, 3 * n * n)
    out = ev(state, x, y, jax.random.key(5))
    assert out["rel_l2"].shape == (x.shape[0], 3)
    assert np.isfinite(float(out["loss"]))
    # predictive-mean variant
    ev20 = make_glow_eval_step(model, SobelFilter(n), 150.0, 50.0,
                               3 * n * n, n_samples=4)
    out2 = ev20(state, x, y, jax.random.key(5))
    assert out2["output"].shape == y.shape


def test_data_init_actnorm_changes_params():
    model, state, tx, x, y, n = _setup()
    state2 = data_init_actnorm(model, state, y, x)
    before = jax.tree_util.tree_leaves(state.params)
    after = jax.tree_util.tree_leaves(state2.params)
    assert any(not np.allclose(a, b) for a, b in zip(before, after))
    # sequential (Gauss-Seidel) semantics: every initialized actnorm's
    # weight must be O(1) — the round-4 simultaneous sweep diverged
    # oscillating on deep stacks (|w| 2e-4 .. 3e4; NaN from epoch 1 at
    # the 64^2 canonical config)
    for path, w in jax.tree_util.tree_flatten_with_path(state2.params)[0]:
        s = jax.tree_util.keystr(path)
        if "norm" in s and "weight" in s and "revlayer" in s:
            w = np.abs(np.asarray(w))
            assert 1e-2 < w.min() and w.max() < 1e2, (s, w.min(), w.max())
    # and the model still generates finite, data-scale samples
    out, logp = model.apply(
        {"params": state2.params, "batch_stats": state2.batch_stats,
         "constants": state2.constants},
        x, key=jax.random.key(1), train=False, method=model.generate)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.max(jnp.abs(out))) < 1e3


def test_propagate_scan_properties():
    """The single-program propagate: deterministic in the key, variance
    outputs nonnegative, and invariant to the chunking batch size."""
    model, state, tx, x, y, n = _setup()
    s = GlowSurrogate(model, state, n_samples=3, temperature=1.0)
    mc = np.asarray(jnp.concatenate([x, x], 0))  # 16 inputs
    key = jax.random.key(9)
    a = s.propagate(mc, key, var_samples=2, batch_size=8)
    b = s.propagate(mc, key, var_samples=2, batch_size=8)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
    ee, ve, ev, vv = (np.asarray(t) for t in a)
    assert ee.shape == (n, n, 3)
    assert np.isfinite(ee).all()
    assert (ve >= 0).all() and (vv >= 0).all()
    assert (ev >= -1e-5).all()  # E[y^2]-E[y]^2 up to rounding


def test_glow_surrogate_and_uq(tmp_path):
    model, state, tx, x, y, n = _setup()
    s = GlowSurrogate(model, state, n_samples=3, temperature=1.0)
    mean, var = s.predict(x, jax.random.key(0))
    assert mean.shape == y.shape and var.shape == y.shape
    assert bool(jnp.all(var >= 0))

    x_np, y_np = np.asarray(x), np.asarray(y)
    uq = UQCondGlow(s, (x_np, y_np), (x_np, y_np),
                    ((y_np - y_np.mean(0)) ** 2).sum((0, 1, 2)),
                    post_dir=str(tmp_path), imsize=n, batch_size=4)
    rel, r2 = uq.test_metric(handle_nan=True)
    assert rel.shape == (3,) and np.isfinite(rel).all()
    freq = uq.plot_reliability_diagram(save_time=True)
    assert freq.shape == (10, 3)
    assert (freq >= 0).all() and (freq <= 1).all()
    ee, ve, ev, vv = uq.propagate_uncertainty(var_samples=2)
    assert ee.shape == y.shape[1:]


def test_uq_test_metric_all_nan(tmp_path):
    """A fully diverged checkpoint (every predictive mean NaN) must still
    report abnormal-rate stats, not crash on an empty concatenate."""

    class _NaNSurrogate:
        def predict(self, x, key):
            m = jnp.full(x.shape[:3] + (3,), jnp.nan)
            return m, jnp.zeros_like(m)

    n, bs = 16, 8
    x_np = np.random.default_rng(0).standard_normal(
        (bs, n, n, 1)).astype(np.float32)
    y_np = np.random.default_rng(1).standard_normal(
        (bs, n, n, 3)).astype(np.float32)
    uq = UQCondGlow(_NaNSurrogate(), (x_np, y_np), (x_np, y_np),
                    ((y_np - y_np.mean(0)) ** 2).sum((0, 1, 2)),
                    post_dir=str(tmp_path), imsize=n, batch_size=4,
                    key=jax.random.key(0))
    rel, r2 = uq.test_metric(handle_nan=True)
    assert rel.shape == (3,) and np.isnan(rel).all() and np.isnan(r2).all()
    stats = np.loadtxt(tmp_path / "log_stats.txt")
    assert stats[0] == bs and stats[2] == 1.0


def test_glow_scan_epoch_matches_eager():
    """make_glow_epoch_fn (constants/key out of the scan carry —
    logs/glow_scan_probe_r3.log) must match the eager loop: per-step keys
    fold state.step, so the math is identical; the compiled epoch
    executable fuses differently than the step executable, so agreement
    is float-reassociation-level, not bitwise."""
    from pde_surrogate_tpu.train.glow_trainer import make_glow_epoch_fn

    model, state, tx, x, y, n = _setup(bs=8)
    step = make_reverse_kl_step(model, tx, SobelFilter(n), beta=150.0,
                                weight_bound=50.0, n_out_pixels=3 * n * n)
    steps = 3
    xs = jnp.asarray(sample_kle(8 * steps, n, 16, rng=2)[..., None])
    idx = jnp.arange(8 * steps, dtype=jnp.int32).reshape(steps, 8)

    st_e = state
    eager_losses = []
    for s in range(steps):
        st_e, m = jax.jit(step.core)(st_e, jnp.take(xs, idx[s], axis=0))
        eager_losses.append(float(m["loss"]))

    epoch_fn = make_glow_epoch_fn(step.core)
    st_s, metrics = epoch_fn(state, idx, xs)
    np.testing.assert_allclose(np.asarray(metrics["loss"]),
                               np.asarray(eager_losses, np.float32),
                               rtol=1e-5)
    assert int(st_s.step) == steps
    # Step k's loss is computed on step k-1's params, so the 1e-7-level
    # agreement across all steps pins the applied updates too.  Direct
    # end-param comparison is NOT meaningful here: leaves with ~zero
    # gradient (Conv2dZeros-style zero-init heads) get Adam updates of
    # +-lr * sign(noise), so executable-level reassociation flips signs
    # and leaves diverge by O(lr) with no effect on the loss.


def test_glow_eval_epoch_matches_eager():
    """make_glow_eval_epoch_fn (one device program per eval epoch) must
    reproduce the eager per-batch eval loop: per-batch keys enter as a scan
    input built exactly like the driver's fold_in counters."""
    from pde_surrogate_tpu.train.glow_trainer import make_glow_eval_epoch_fn

    model, state, tx, x, y, n = _setup(bs=8)
    ev = make_glow_eval_step(model, SobelFilter(n), 150.0, 50.0, 3 * n * n)
    nb = 3
    xs = jnp.asarray(sample_kle(8 * nb, n, 16, rng=2)[..., None])
    ys = jnp.asarray(np.random.default_rng(4).standard_normal(
        (8 * nb, n, n, 3)).astype(np.float32) * 0.1)
    idx = jnp.arange(8 * nb, dtype=jnp.int32).reshape(nb, 8)
    base = jax.random.key(7)
    keys = jax.vmap(lambda d: jax.random.fold_in(base, d))(jnp.arange(nb))

    eager = [ev(state, xs[np.asarray(idx[i])], ys[np.asarray(idx[i])],
                jax.random.fold_in(base, i)) for i in range(nb)]

    epoch_fn = make_glow_eval_epoch_fn(ev.core)
    ms = epoch_fn(state, idx, keys, xs, ys)
    assert "output" not in ms
    for k in ("loss", "neg_entropy"):
        np.testing.assert_allclose(
            np.asarray(ms[k]),
            np.asarray([float(e[k]) for e in eager], np.float32), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ms["rel_l2"]),
        np.stack([np.asarray(e["rel_l2"]) for e in eager]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ms["sse"]),
        np.stack([np.asarray(e["sse"]) for e in eager]), rtol=1e-4)

    # the predictive-mean variant scans too
    ev4 = make_glow_eval_step(model, SobelFilter(n), 150.0, 50.0,
                              3 * n * n, n_samples=4)
    ms4 = make_glow_eval_epoch_fn(ev4.core)(state, idx, keys, xs, ys)
    e4 = ev4(state, xs[np.asarray(idx[0])], ys[np.asarray(idx[0])],
             jax.random.fold_in(base, 0))
    np.testing.assert_allclose(float(ms4["loss"][0]), float(e4["loss"]),
                               rtol=1e-5)


def test_glow_data_parallel_step_on_fake_mesh():
    """Reverse-KL DP == single-device (the codec analog is
    tests/test_training.py::test_data_parallel_step_on_fake_mesh): the same
    jitted step runs SPMD over the 8-device CPU mesh with the batch sharded
    and state replicated.  A sharding regression in the flow's eps/key
    handling (per-device keys, split sampling) would break the loss match.
    Losses are compared across 3 steps — step k's loss is computed on step
    k-1's params, pinning the applied updates (direct leaf comparison is
    meaningless for ~zero-grad Conv2dZeros heads, see the scan test)."""
    from pde_surrogate_tpu.parallel.mesh import (batch_sharding, data_mesh,
                                                 replicate)

    model, state, tx, x, y, n = _setup(bs=8)
    step = make_reverse_kl_step(model, tx, SobelFilter(n), beta=150.0,
                                weight_bound=50.0, n_out_pixels=3 * n * n)
    s1 = state
    single = []
    for _ in range(3):
        s1, m = step(s1, x)
        single.append(float(m["loss"]))

    mesh = data_mesh(8)
    model2, state2, tx2, _, _, _ = _setup(bs=8)
    state2 = replicate(state2, mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    dp = []
    for _ in range(3):
        state2, m = step(state2, xs)
        dp.append(float(m["loss"]))
    np.testing.assert_allclose(np.asarray(dp), np.asarray(single), rtol=2e-5)
    assert int(state2.step) == 3
