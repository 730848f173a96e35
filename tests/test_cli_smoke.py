"""End-to-end driver smokes: each CLI runs a tiny config to completion.

These exercise dataset generation, training loops, checkpointing, and
metric reporting through the real entry points (argv-level), on CPU.
"""

import json
import os

import numpy as np
import pytest

# minute-scale e2e runs — deselected from the default guard path
pytestmark = pytest.mark.slow


def _common(tmp_path, extra):
    return [
        "--data-dir", str(tmp_path / "datasets"),
        "--exp-dir", str(tmp_path / "experiments"),
        "--no-plot",
    ] + extra


def test_train_codec_mixed_residual_cli(tmp_path):
    from pde_surrogate_tpu.cli.train_codec_mixed_residual import main
    state, logger = main(_common(tmp_path, [
        "--ntrain", "16", "--ntest", "8", "--batch-size", "8",
        "--test-batch-size", "8", "--imsize", "16", "--epochs", "2",
        "--blocks", "1,2,1", "--growth-rate", "4", "--init-features", "8",
        "--ckpt-freq", "2"]))
    assert len(logger["loss_train"]) == 2
    assert np.isfinite(logger["loss_train"]).all()
    # args.txt round-trip + checkpoint on disk
    runs = list((tmp_path / "experiments" / "codec" /
                 "mixed_residual").iterdir())
    assert len(runs) == 1
    args = json.loads((runs[0] / "args.txt").read_text())
    assert args["ntrain"] == 16
    assert any(f.name.startswith("model_epoch2")
               for f in (runs[0] / "checkpoints").iterdir())
    # stats dumped
    assert (runs[0] / "training" / "nrmse_test.txt").exists()


def test_predict_codec_cli(tmp_path):
    """Serving surface: train tiny, then batch-predict from the checkpoint
    over the labeled val file and write the reference NCHW layout.

    Trains with a nonzero --weight-decay: that adds an element to the optax
    chain, so this also guards the restore template rebuilding the SAME
    opt_state pytree structure (regression: predict_codec used to default
    weight_decay=0 and crash in from_bytes)."""
    import h5py
    from pde_surrogate_tpu.cli.predict_codec import main as predict_main
    from pde_surrogate_tpu.cli.train_codec_mixed_residual import main
    main(_common(tmp_path, [
        "--ntrain", "16", "--ntest", "8", "--batch-size", "8",
        "--test-batch-size", "8", "--imsize", "16", "--epochs", "2",
        "--blocks", "1,2,1", "--growth-rate", "4", "--init-features", "8",
        "--ckpt-freq", "2", "--weight-decay", "1e-4"]))
    run_dir = next((tmp_path / "experiments" / "codec" /
                    "mixed_residual").iterdir())
    val = tmp_path / "datasets" / "16x16" / "kle512_lhs1000_val.hdf5"
    out = tmp_path / "pred.hdf5"
    pred, rel_l2, r2 = predict_main([
        "--run-dir", str(run_dir), "--input", str(val),
        "--output", str(out), "--batch-size", "4",
        "--select-consistency"])
    assert pred.shape == (8, 16, 16, 3)
    assert rel_l2.shape == (3,) and np.isfinite(rel_l2).all()
    assert r2.shape == (3,)
    with h5py.File(out) as f:
        assert f["input"].shape == (8, 1, 16, 16)
        assert f["output"].shape == (8, 3, 16, 16)


@pytest.mark.parametrize("physics", ["fv", "fvcg", "sobel_fvcg"])
def test_train_codec_fv_physics_cli(tmp_path, physics):
    """--physics fv/fvcg/sobel_fvcg: the FV-family objectives train e2e
    (sobel_fvcg runs with the round-4 flux anchor + explicit CG depth)."""
    from pde_surrogate_tpu.cli.train_codec_mixed_residual import main
    extra = ["--fvcg-flux-weight", "1", "--fvcg-iters", "8"] \
        if physics == "sobel_fvcg" else []
    state, logger = main(_common(tmp_path, [
        "--ntrain", "16", "--ntest", "8", "--batch-size", "8",
        "--test-batch-size", "8", "--imsize", "16", "--epochs", "2",
        "--blocks", "1,2,1", "--growth-rate", "4", "--init-features", "8",
        "--ckpt-freq", "2", "--physics", physics] + extra))
    assert np.isfinite(logger["loss_train"]).all()
    assert logger["loss_train"][-1] < logger["loss_train"][0]


def test_train_codec_max_likelihood_cli(tmp_path):
    from pde_surrogate_tpu.cli.train_codec_max_likelihood import main
    state, logger = main(_common(tmp_path, [
        "--ntrain", "16", "--ntest", "8", "--batch-size", "8",
        "--test-batch-size", "8", "--imsize", "16", "--epochs", "2",
        "--blocks", "1,2,1", "--growth-rate", "4", "--init-features", "8"]))
    assert logger["loss_train"][1] < logger["loss_train"][0] * 10


def test_solve_fc_cli(tmp_path):
    from pde_surrogate_tpu.cli.solve_fc_mixed_residual import main
    params, logger, target = main(_common(tmp_path, [
        "--imsize", "16", "--kle", "128", "--idx", "1", "--dim-hidden", "32",
        "--layers-hidden", "2", "--n-colloc", "256", "--epochs", "3",
        "--test-freq", "3", "--adam-warmup", "20"]))
    assert len(logger["loss"]) == 3
    assert logger["loss"][-1] <= logger["loss"][0]
    assert target.shape == (3, 16, 16)


def test_solve_conv_cli(tmp_path):
    from pde_surrogate_tpu.cli.solve_conv_mixed_residual import main
    params, logger, target = main(_common(tmp_path, [
        "--imsize", "16", "--kle", "128", "--idx", "1", "--blocks", "2,2",
        "--epochs", "2", "--test-freq", "2", "--adam-warmup", "20"]))
    assert len(logger["loss"]) == 2
    assert np.isfinite(logger["loss"]).all()


def test_solve_conv_warmup_zoom_cli(tmp_path):
    """Adam warmup (scanned chunks) + zoom L-BFGS + 5x5 stencil — the
    FC-solver recipe ported to the conv solver."""
    from pde_surrogate_tpu.cli.solve_conv_mixed_residual import main
    params, logger, target = main(_common(tmp_path, [
        "--imsize", "16", "--kle", "128", "--idx", "1", "--blocks", "2,2",
        "--epochs", "1", "--test-freq", "1", "--linesearch", "zoom",
        "--adam-warmup", "10", "--sobel-size", "5"]))
    assert len(logger["loss"]) == 1
    assert np.isfinite(logger["loss"]).all()


def test_solve_conv_nonlinear_cli(tmp_path):
    """--nonlinear: FV-Newton oracle + .npy cache
    (solve_conv_mixed_residual.py:102-114)."""
    from pde_surrogate_tpu.cli.solve_conv_mixed_residual import main
    argv = _common(tmp_path, [
        "--imsize", "16", "--kle", "128", "--idx", "1", "--blocks", "2,2",
        "--epochs", "2", "--test-freq", "2", "--nonlinear",
        "--alpha1", "0.5", "--alpha2", "0.5",
        # tiny warmup: the 20k-step default costs minutes on one CPU core
        # and is exercised separately by test_solve_conv_warmup_zoom_cli
        "--adam-warmup", "20"])
    params, logger, target = main(argv)
    assert target.shape == (3, 16, 16) and np.isfinite(target).all()
    # nonlinear oracle obeys the BCs: u(:,0)=1, u(:,-1)=0, sigma2 = 0 walls
    assert np.allclose(target[0, :, 0], 1.0, atol=1e-4)
    assert np.allclose(target[0, :, -1], 0.0, atol=1e-4)
    cache = list((tmp_path / "experiments").rglob("output_fv_newton.npy"))
    assert len(cache) == 1
    # second run must reuse the cached oracle (mtime unchanged)
    mtime = cache[0].stat().st_mtime_ns
    main(argv)
    assert cache[0].stat().st_mtime_ns == mtime


def test_codec_resume_cli(tmp_path):
    """--ckpt-epoch resume reproduces the uninterrupted run exactly
    (deterministic data streams + full-state checkpoints)."""
    from pde_surrogate_tpu.cli.train_codec_mixed_residual import main
    argv = _common(tmp_path, [
        "--ntrain", "16", "--ntest", "8", "--batch-size", "8",
        "--test-batch-size", "8", "--imsize", "16", "--epochs", "2",
        "--blocks", "1,2,1", "--growth-rate", "4", "--init-features", "8",
        "--ckpt-freq", "1"])
    state, logger = main(argv)
    state2, logger2 = main(argv + ["--ckpt-epoch", "1"])
    # resume restores the saved history (epoch 1) and continues (epoch 2),
    # so curves and label-free checkpoint selection span the whole run
    assert len(logger2["loss_train"]) == 2
    np.testing.assert_allclose(logger2["loss_train"][0],
                               logger["loss_train"][0], rtol=1e-5)
    np.testing.assert_allclose(logger2["loss_train"][1],
                               logger["loss_train"][1], rtol=1e-5)


def test_codec_dp_driver_cli(tmp_path):
    """Driver-level data parallelism: --n-devices 8 exercises DeviceDataset
    sharding + state replication + the SPMD step from argv."""
    from pde_surrogate_tpu.cli.train_codec_mixed_residual import main
    state, logger = main(_common(tmp_path, [
        "--ntrain", "16", "--ntest", "8", "--batch-size", "8",
        "--test-batch-size", "8", "--imsize", "16", "--epochs", "2",
        "--blocks", "1,2,1", "--growth-rate", "4", "--init-features", "8",
        "--n-devices", "8"]))
    assert len(logger["loss_train"]) == 2
    assert np.isfinite(logger["loss_train"]).all()
    assert np.isfinite(logger["nrmse_test"]).all()


def test_codec_scan_epochs_cli(tmp_path):
    """The default scan-epoch program and --no-scan-epochs eager loop train
    identically (same data stream, same init)."""
    from pde_surrogate_tpu.cli.train_codec_mixed_residual import main
    base = [
        "--ntrain", "16", "--ntest", "8", "--batch-size", "8",
        "--test-batch-size", "8", "--imsize", "16", "--epochs", "2",
        "--blocks", "1,2,1", "--growth-rate", "4", "--init-features", "8"]
    state, logger = main(_common(tmp_path, base + ["--run", "1"]))
    state2, logger2 = main(_common(tmp_path, base + ["--run", "2",
                                                     "--no-scan-epochs"]))
    np.testing.assert_allclose(logger2["loss_train"], logger["loss_train"],
                               rtol=1e-5)
    # the scanned whole-test-set eval must agree with the eager per-batch
    # loop (same metrics from one device program vs steps_per_epoch of them)
    np.testing.assert_allclose(logger2["loss_test"], logger["loss_test"],
                               rtol=1e-5)
    np.testing.assert_allclose(logger2["nrmse_test"], logger["nrmse_test"],
                               rtol=1e-5)
    np.testing.assert_allclose(logger2["consistency_test"],
                               logger["consistency_test"], rtol=1e-5)


def test_find_lr_cli(tmp_path):
    """--find-lr runs the LR-range test and writes find_lr.{txt,pdf}."""
    from pde_surrogate_tpu.cli.train_codec_mixed_residual import main
    log_lrs, losses = main(_common(tmp_path, [
        "--ntrain", "32", "--ntest", "8", "--batch-size", "8",
        "--test-batch-size", "8", "--imsize", "16", "--epochs", "2",
        "--blocks", "1,2,1", "--growth-rate", "4", "--init-features", "8",
        "--find-lr"]))
    assert 1 <= len(losses) <= 4 and np.isfinite(losses).all()
    out = list((tmp_path / "experiments").rglob("find_lr.txt"))
    assert len(out) == 1
    assert (out[0].parent / "find_lr.pdf").exists()


def test_train_cglow_wide_coupling_cli(tmp_path):
    """--coupling wide selects the width-128 conv coupling net
    (reference README.md:70, glow_msc.py:259-272)."""
    from pde_surrogate_tpu.cli.train_cglow_reverse_kl import main as train_main
    state, logger = train_main(_common(tmp_path, [
        "--kle", "64", "--ntrain", "8", "--ntest", "8", "--imsize", "16",
        "--enc-blocks", "2,2", "--flow-blocks", "2,2", "--batch-size", "8",
        "--test-batch-size", "8", "--epochs", "1", "--coupling", "wide"]))
    import jax
    assert np.isfinite(logger["loss_train"]).all()
    leaves = jax.tree_util.tree_leaves(state.params)
    assert leaves  # params built through the wide-coupling path


@pytest.mark.parametrize("physics,extra,suffix", [
    ("sobel_fvcg", ["--fvcg-flux-weight", "1"], "_sobel_fvcg_fw1_cg8"),
    ("fvcg", [], "_fvcg_cg8"),
])
def test_train_cglow_fvcg_physics_cli(tmp_path, physics, extra, suffix):
    """cGlow --physics sobel_fvcg / fvcg (round 4): the CG anchors ride
    the reverse-KL objective through the full driver incl. scan-epochs and
    the physics run-dir suffix."""
    from pde_surrogate_tpu.cli.train_cglow_reverse_kl import main as train_main
    state, logger = train_main(_common(tmp_path, [
        "--kle", "64", "--ntrain", "8", "--ntest", "8", "--imsize", "16",
        "--enc-blocks", "2,2", "--flow-blocks", "2,2", "--batch-size", "8",
        "--test-batch-size", "8", "--epochs", "1",
        "--physics", physics, "--fvcg-iters", "8"] + extra))
    assert np.isfinite(logger["loss_train"]).all()
    runs = list((tmp_path / "experiments" / "cglow" / "reverse_kld").iterdir())
    assert any(suffix in r.name for r in runs)


def test_train_cglow_init_from_cli(tmp_path):
    """--init-from warm-starts weights with a fresh optimizer/schedule and
    must NOT blow up on the first epochs (the --resume-into-longer-schedule
    pattern did: stale Adam moments + mid-schedule lr)."""
    from pde_surrogate_tpu.cli.train_cglow_reverse_kl import main as train_main
    common = ["--kle", "64", "--ntrain", "16", "--ntest", "8", "--imsize",
              "16", "--enc-blocks", "2,2", "--flow-blocks", "2,2",
              "--batch-size", "8", "--test-batch-size", "8"]
    state, logger = train_main(_common(tmp_path, common + [
        "--epochs", "2", "--ckpt-freq", "2"]))
    run0 = next((tmp_path / "experiments" / "cglow" / "reverse_kld").iterdir())
    state2, logger2 = train_main(_common(tmp_path, common + [
        "--epochs", "1", "--lr", "0.0005", "--exp-name", "warm",
        "--init-from", str(run0)]))
    assert np.isfinite(logger2["loss_train"]).all()
    # warm start resumes near the donor's loss level, not from random init
    assert logger2["loss_train"][0] < 3 * logger["loss_train"][-1] + 100


def test_train_cglow_init_from_resolves_squeeze_order(tmp_path):
    """--init-from a run dir whose args.txt records
    squeeze_order='reference' (import_torch_ckpt --model glow does) must
    build the trainer's model with that order — the param trees of both
    orders are identical, so the round-3 trainer silently loaded imported
    weights into the wrong channel encoding (advisor r3, medium)."""
    import json
    import os

    import pytest

    from pde_surrogate_tpu.cli.train_cglow_reverse_kl import Parser

    src = tmp_path / "imported_run"
    src.mkdir()
    (src / "args.txt").write_text(json.dumps({"squeeze_order": "reference"}))
    argv = _common(tmp_path, ["--kle", "64", "--ntrain", "16", "--ntest",
                              "8", "--imsize", "16", "--enc-blocks", "2,2",
                              "--flow-blocks", "2,2", "--batch-size", "8",
                              "--test-batch-size", "8",
                              "--init-from", str(src)])
    args = Parser().parse(argv)
    assert args.squeeze_order == "reference"
    # and it is re-persisted into the new run dir for post_cglow
    recorded = json.loads(
        open(os.path.join(args.run_dir, "args.txt")).read())
    assert recorded["squeeze_order"] == "reference"
    # an explicit conflicting flag is an error, not silent corruption
    with pytest.raises(ValueError, match="squeeze"):
        Parser().parse(argv + ["--squeeze-order", "subpixel"])
    # without --init-from the default stands
    args2 = Parser().parse(_common(tmp_path, [
        "--kle", "64", "--ntrain", "16", "--ntest", "8", "--imsize", "16",
        "--enc-blocks", "2,2", "--flow-blocks", "2,2", "--batch-size", "8",
        "--test-batch-size", "8"]))
    assert args2.squeeze_order == "subpixel"


def test_train_codec_warped_grf_cli(tmp_path):
    """--data warped_grf end-to-end: dataset generation (warped-GP inputs +
    FV-solved labels) through the mixed-residual loop."""
    from pde_surrogate_tpu.cli.train_codec_mixed_residual import main
    state, logger = main(_common(tmp_path, [
        "--data", "warped_grf", "--ntrain", "16", "--ntest", "8",
        "--batch-size", "8", "--test-batch-size", "8", "--imsize", "16",
        "--epochs", "1"]))
    assert np.isfinite(logger["loss_train"]).all()


def test_predict_cglow_cli(tmp_path):
    """Flow serving surface: train tiny cGlow (nonzero weight decay guards
    the restore-template opt_state structure), then batch-predict the
    labeled val file's predictive mean/std and check the NCHW layout."""
    import h5py
    from pde_surrogate_tpu.cli.predict_cglow import main as predict_main
    from pde_surrogate_tpu.cli.train_cglow_reverse_kl import main as train_main
    train_main(_common(tmp_path, [
        "--kle", "64", "--ntrain", "16", "--ntest", "8", "--imsize", "16",
        "--enc-blocks", "2,2", "--flow-blocks", "2,2", "--batch-size", "8",
        "--test-batch-size", "8", "--epochs", "2", "--ckpt-freq", "2",
        "--weight-decay", "1e-4"]))
    run_dir = next((tmp_path / "experiments" / "cglow" /
                    "reverse_kld").iterdir())
    val = tmp_path / "datasets" / "16x16" / "kle64_lhs1000_val.hdf5"
    out = tmp_path / "pred.hdf5"
    mean, std, rel_l2, r2 = predict_main([
        "--run-dir", str(run_dir), "--input", str(val),
        "--output", str(out), "--batch-size", "4", "--n-samples", "3"])
    assert mean.shape == (8, 16, 16, 3) and std.shape == mean.shape
    assert (std >= 0).all()
    assert rel_l2.shape == (3,) and r2.shape == (3,)
    with h5py.File(out) as f:
        assert f["input"].shape == (8, 1, 16, 16)
        assert f["output"].shape == (8, 3, 16, 16)
        assert f["output_std"].shape == (8, 3, 16, 16)


def test_train_cglow_and_post_cli(tmp_path):
    """train_cglow_reverse_kl -> post_cglow chained: checkpoint restore +
    all five UQ tasks through argv (reference post_cglow.py)."""
    from pde_surrogate_tpu.cli.post_cglow import main as post_main
    from pde_surrogate_tpu.cli.train_cglow_reverse_kl import main as train_main
    state, logger = train_main(_common(tmp_path, [
        "--kle", "64", "--ntrain", "16", "--ntest", "8", "--imsize", "16",
        "--enc-blocks", "2,2", "--flow-blocks", "2,2", "--batch-size", "8",
        "--test-batch-size", "8", "--epochs", "2", "--ckpt-freq", "2"]))
    assert np.isfinite(logger["loss_train"]).all()
    assert len(logger["entropy_test"]) == 2

    runs = list((tmp_path / "experiments" / "cglow" / "reverse_kld").iterdir())
    assert len(runs) == 1
    uq = post_main(["--run-dir", str(runs[0]), "--n-monte-carlo", "8",
                    "--ntest", "8", "--batch-size", "4", "--n-samples", "3",
                    "--var-samples", "2", "--n-pred", "1", "--num-loc", "2",
                    "--plot-samples"])
    post_dir = runs[0] / "post_proc_epoch2"
    rel = np.loadtxt(post_dir / "nrmse_test.txt")
    assert rel.shape == (3,) and np.isfinite(rel).all()
    assert (post_dir / "r2_test.txt").exists()
    assert (post_dir / "uncertainty_quality" /
            "reliability_diagram.txt").exists()
    assert (post_dir / "out_stats" / "out_stats.mat").exists()


def test_train_cglow_channelized_and_post_cli(tmp_path):
    """cGlow on the channelized family (round 4 — beyond the reference,
    which ships cGlow for GRF-KLE only): --data channelized rides the
    codec's resolve_dataset_files, the run dir leads with the family name,
    and post_cglow resolves family-matched MC/val sets (uq_dataset_files)."""
    from pde_surrogate_tpu.cli.post_cglow import main as post_main
    from pde_surrogate_tpu.cli.train_cglow_reverse_kl import main as train_main
    state, logger = train_main(_common(tmp_path, [
        "--data", "channelized", "--ntrain", "16", "--ntest", "8",
        "--imsize", "16", "--enc-blocks", "2,2", "--flow-blocks", "2,2",
        "--batch-size", "8", "--test-batch-size", "8", "--epochs", "2",
        "--physics", "fvcg", "--fvcg-iters", "8", "--ckpt-freq", "2"]))
    assert np.isfinite(logger["loss_train"]).all()
    runs = list((tmp_path / "experiments" / "cglow" / "reverse_kld").iterdir())
    assert len(runs) == 1 and runs[0].name.startswith("channelized_")
    # the trainer generated the channelized (not kle) dataset files
    ds = tmp_path / "datasets" / "16x16"
    assert (ds / "channel_ng64_n4096_train.hdf5").exists()
    uq = post_main(["--run-dir", str(runs[0]), "--n-monte-carlo", "8",
                    "--ntest", "8", "--batch-size", "4", "--n-samples", "3",
                    "--var-samples", "2", "--n-pred", "1", "--num-loc", "2"])
    assert (ds / "channel_ng64_n10000_mc.hdf5").exists()
    post_dir = runs[0] / "post_proc_epoch2"
    rel = np.loadtxt(post_dir / "nrmse_test.txt")
    assert rel.shape == (3,) and np.isfinite(rel).all()
