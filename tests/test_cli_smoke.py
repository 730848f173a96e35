"""End-to-end driver smokes: each CLI runs a tiny config to completion.

These exercise dataset generation, training loops, checkpointing, and
metric reporting through the real entry points (argv-level), on CPU.
"""

import json
import os

import numpy as np
import pytest


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
        "--test-freq", "3"]))
    assert len(logger["loss"]) == 3
    assert logger["loss"][-1] <= logger["loss"][0]
    assert target.shape == (3, 16, 16)


def test_solve_conv_cli(tmp_path):
    from pde_surrogate_tpu.cli.solve_conv_mixed_residual import main
    params, logger, target = main(_common(tmp_path, [
        "--imsize", "16", "--kle", "128", "--idx", "1", "--blocks", "2,2",
        "--epochs", "2", "--test-freq", "2"]))
    assert len(logger["loss"]) == 2
    assert np.isfinite(logger["loss"]).all()
