"""End-to-end training smoke tests + schedule/checkpoint/pipeline units."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_surrogate_tpu.data.grf import sample_kle
from pde_surrogate_tpu.data.hdf5 import load_data, save_dataset
from pde_surrogate_tpu.data.pipeline import DeviceDataset
from pde_surrogate_tpu.models.codec import DenseED
from pde_surrogate_tpu.ops.filters import SobelFilter
from pde_surrogate_tpu.parallel.mesh import (batch_sharding,
                                             batch_space_sharding, data_mesh,
                                             dp_sp_mesh, replicate,
                                             shard_batch)
from pde_surrogate_tpu.train.checkpoint import (latest_epoch,
                                                restore_checkpoint,
                                                save_checkpoint)
from pde_surrogate_tpu.train.codec_trainer import (create_state,
                                                   current_lr,
                                                   make_eval_step,
                                                   make_mixed_residual_step,
                                                   make_mle_step)
from pde_surrogate_tpu.train.schedules import one_cycle


def small_model(imsize=32):
    return DenseED(1, 3, imsize=imsize, blocks=[2, 3, 2], growth_rate=8,
                   init_features=16)


def test_one_cycle_matches_reference_formula():
    """Spot-check against hand-evaluated reference values
    (utils/practices.py:16-35, lr_max=1e-3, div=2, pct=0.3)."""
    sched = one_cycle(1e-3, div_factor=2.0, pct_start=0.3)
    np.testing.assert_allclose(float(sched(0.0)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(0.3)), 1e-3, rtol=1e-5)
    # end anneals to lr_low/1e4
    np.testing.assert_allclose(float(sched(1.0)), 5e-4 / 1e4, rtol=1e-4,
                               atol=1e-9)
    # midpoint of cosine phase: avg of max and floor
    mid = (1e-3 + 5e-8) / 2
    np.testing.assert_allclose(float(sched(0.65)), mid, rtol=1e-5)
    # clamped past pct=1: the periodic cosine must NOT ride back up when an
    # optimizer steps beyond total_steps (regression)
    np.testing.assert_allclose(float(sched(1.7)), float(sched(1.0)), rtol=0)


def test_mixed_residual_training_reduces_loss(rng):
    n, bs = 32, 8
    x = jnp.asarray(sample_kle(bs, n, 32, rng=rng)[..., None])
    model = small_model(n)
    state, tx = create_state(model, jax.random.key(0), x, lr_max=1e-3,
                             total_steps=30)
    step = make_mixed_residual_step(model, tx, SobelFilter(n), 10.0)
    state, m0 = step(state, x)
    first = float(m0["loss"])
    for _ in range(25):
        state, m = step(state, x)
    assert float(m["loss"]) < first
    assert int(state.step) == 26
    assert np.isfinite(current_lr(state))


def test_mle_training_reduces_loss(rng):
    n, bs = 32, 8
    x = jnp.asarray(sample_kle(bs, n, 32, rng=rng)[..., None])
    y = jnp.tanh(x.repeat(3, axis=-1))
    model = small_model(n)
    state, tx = create_state(model, jax.random.key(0), x, lr_max=1e-3,
                             total_steps=30)
    step = make_mle_step(model, tx)
    state, m0 = step(state, x, y)
    for _ in range(25):
        state, m = step(state, x, y)
    assert float(m["loss"]) < float(m0["loss"])


def test_dropout_training_step(rng):
    """--drop-rate > 0 trains: the step must supply a 'dropout' rng
    (regression: model.apply without rngs raised InvalidRngError)."""
    n, bs = 32, 4
    x = jnp.asarray(sample_kle(bs, n, 32, rng=rng)[..., None])
    model = DenseED(1, 3, imsize=n, blocks=[2, 3, 2], growth_rate=8,
                    init_features=16, drop_rate=0.2)
    state, tx = create_state(model, jax.random.key(0), x, lr_max=1e-3,
                             total_steps=4)
    step = make_mixed_residual_step(model, tx, SobelFilter(n), 10.0)
    state, m = step(state, x)
    assert np.isfinite(float(m["loss"]))
    # per-step dropout key folds state.step: successive steps differ
    step_mle = make_mle_step(model, tx)
    y = jnp.tanh(x.repeat(3, axis=-1))
    state, m2 = step_mle(state, x, y)
    assert np.isfinite(float(m2["loss"]))


def test_eval_step_metrics(rng):
    n = 32
    x = jnp.asarray(sample_kle(4, n, 32, rng=rng)[..., None])
    y = jnp.tanh(x.repeat(3, axis=-1))
    model = small_model(n)
    state, _ = create_state(model, jax.random.key(0), x, 1e-3, 10)
    ev = make_eval_step(model, SobelFilter(n))
    out = ev(state, x, y)
    assert out["rel_l2"].shape == (4, 3)
    assert out["sse"].shape == (4, 3)
    assert out["output"].shape == y.shape


def test_data_parallel_step_on_fake_mesh(rng):
    """The same jitted step runs SPMD over an 8-device CPU mesh; the result
    matches the single-device step (same math, psum'd grads)."""
    n, bs = 32, 8
    mesh = data_mesh(8)
    x = jnp.asarray(sample_kle(bs, n, 32, rng=rng)[..., None])
    model = small_model(n)
    state, tx = create_state(model, jax.random.key(0), x, 1e-3, 10)
    step = make_mixed_residual_step(model, tx, SobelFilter(n), 10.0)

    # single-device
    s1, m1 = step(state, x)

    # sharded: batch split across 8 devices, state replicated
    state2, _ = create_state(model, jax.random.key(0), x, 1e-3, 10)
    state2 = replicate(state2, mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    s2, m2 = step(state2, xs)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    # two more steps, then EVERY param leaf must agree (gradient-level
    # equivalence: any sharding-induced grad error compounds across steps)
    for _ in range(2):
        s1, _ = step(s1, x)
        s2, _ = step(s2, xs)
    for l1, l2 in zip(jax.tree_util.tree_leaves(s1.params),
                      jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=2e-5)


def test_dp_sp_2d_mesh_step_on_fake_mesh(rng):
    """Training step over a 2-D (data=4, space=2) mesh: batch sharded on
    data AND height sharded on space.  XLA's SPMD partitioner inserts the
    conv halo exchanges and cross-device BatchNorm reductions; the result
    must match the single-device step."""
    n, bs = 32, 8
    mesh = dp_sp_mesh(4, 2)
    x = jnp.asarray(sample_kle(bs, n, 32, rng=rng)[..., None])
    model = small_model(n)
    state, tx = create_state(model, jax.random.key(0), x, 1e-3, 10)
    step = make_mixed_residual_step(model, tx, SobelFilter(n), 10.0)

    s1, m1 = step(state, x)

    state2, _ = create_state(model, jax.random.key(0), x, 1e-3, 10)
    state2 = replicate(state2, mesh)
    xs = jax.device_put(x, batch_space_sharding(mesh))
    s2, m2 = step(state2, xs)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    # gradient-level equivalence for the spatially-sharded TRAINING path:
    # two more steps, then every param leaf (conv kernels, BN scales/biases
    # whose grads cross the space-halo reductions) must agree
    for _ in range(2):
        s1, _ = step(s1, x)
        s2, _ = step(s2, xs)
    for l1, l2 in zip(jax.tree_util.tree_leaves(s1.params),
                      jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=2e-5)
    # batch_stats follow the same rule (cross-device BatchNorm reductions)
    for l1, l2 in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                      jax.tree_util.tree_leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=2e-5)


def test_device_dataset_deterministic_epochs(rng):
    x = np.arange(40, dtype=np.float32).reshape(20, 2)
    ds = DeviceDataset(x, batch_size=8, key=3)
    a = [np.asarray(b[0]) for b in ds.batches(epoch=5)]
    b = [np.asarray(b[0]) for b in ds.batches(epoch=5)]
    c = [np.asarray(b[0]) for b in ds.batches(epoch=6)]
    assert len(ds) == 2  # drop_last
    np.testing.assert_array_equal(a[0], b[0])
    assert not np.array_equal(a[0], c[0])
    # all elements within an epoch distinct
    seen = np.concatenate([v[:, 0] for v in a])
    assert len(np.unique(seen)) == len(seen)


def test_device_dataset_sharded_batches(rng):
    """Batches come out sharded across the data mesh."""
    mesh = data_mesh(8)
    x = rng.random((32, 4, 4, 1)).astype(np.float32)
    ds = DeviceDataset(x, batch_size=16, key=0,
                       sharding=batch_sharding(mesh))
    (batch,) = next(iter(ds.batches(0)))
    assert len(batch.sharding.device_set) == 8
    assert batch.shape == (16, 4, 4, 1)


def test_resume_reproduces_stream():
    """Deterministic-resume: epoch streams depend only on (key, epoch), so a
    restart at epoch e sees exactly the batches the original run saw."""
    x = np.arange(64, dtype=np.float32).reshape(32, 2)
    a = DeviceDataset(x, batch_size=8, key=9)
    b = DeviceDataset(x, batch_size=8, key=9)  # "restarted process"
    for epoch in (3, 7):
        for ba, bb in zip(a.batches(epoch), b.batches(epoch)):
            np.testing.assert_array_equal(np.asarray(ba[0]),
                                          np.asarray(bb[0]))


def test_hdf5_roundtrip(tmp_path, rng):
    x = rng.random((6, 16, 16, 1)).astype(np.float32)
    y = rng.random((6, 16, 16, 3)).astype(np.float32)
    path = str(tmp_path / "toy.hdf5")
    save_dataset(path, x, y)
    x2, y2, stats = load_data(path, 4, only_input=False, return_stats=True)
    assert x2.shape == (4, 16, 16, 1) and y2.shape == (4, 16, 16, 3)
    np.testing.assert_allclose(x2, x[:4], atol=1e-7)
    np.testing.assert_allclose(y2, y[:4], atol=1e-7)
    assert stats["y_variation"].shape == (3,)
    # NCHW on disk (reference format)
    import h5py
    with h5py.File(path) as f:
        assert f["input"].shape == (6, 1, 16, 16)
        assert f["output"].shape == (6, 3, 16, 16)


def test_checkpoint_prng_key_roundtrip(tmp_path):
    """Typed PRNG keys serialize via key_data and restore as typed keys."""
    state = {"key": jax.random.key(42), "x": jnp.ones((3,))}
    save_checkpoint(str(tmp_path), 1, state)
    restored = restore_checkpoint(str(tmp_path), 1, state)
    assert jax.dtypes.issubdtype(restored["key"].dtype, jax.dtypes.prng_key)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored["key"])),
        np.asarray(jax.random.key_data(state["key"])))


def test_checkpoint_selection_helpers(tmp_path):
    """latest_meta_epoch skips sidecar-less checkpoints (torn save);
    select_consistency_epoch argmins over finite records only."""
    from pde_surrogate_tpu.train.checkpoint import (latest_meta_epoch,
                                                    select_consistency_epoch)
    ckpt_dir = str(tmp_path / "checkpoints")
    state = {"x": jnp.ones((2,))}
    save_checkpoint(ckpt_dir, 1, state, meta={"epoch": 1})
    save_checkpoint(ckpt_dir, 2, state, meta={"epoch": 2})
    save_checkpoint(ckpt_dir, 3, state)  # no meta: a kill between writes
    assert latest_epoch(ckpt_dir) == 3
    assert latest_meta_epoch(ckpt_dir) == 2
    assert latest_meta_epoch(ckpt_dir, at_or_below=1) == 1
    assert select_consistency_epoch([]) is None
    assert select_consistency_epoch([(1, float("nan")), (2, 0.5)]) == (2, 0.5)
    assert select_consistency_epoch(
        [(1, 0.9), (2, 0.05), (3, 0.4)]) == (2, 0.05)


def test_checkpoint_roundtrip(tmp_path, rng):
    n = 32
    x = jnp.asarray(sample_kle(2, n, 16, rng=rng)[..., None])
    model = small_model(n)
    state, tx = create_state(model, jax.random.key(0), x, 1e-3, 10)
    ckpt_dir = str(tmp_path / "checkpoints")
    save_checkpoint(ckpt_dir, 7, state,
                    meta={"epoch": 7, "logger": {"loss": [1.0, 0.5]}})
    assert latest_epoch(ckpt_dir) == 7
    restored, meta = restore_checkpoint(ckpt_dir, 7, state, with_meta=True)
    assert meta["epoch"] == 7
    np.testing.assert_allclose(meta["logger"]["loss"], [1.0, 0.5])
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
