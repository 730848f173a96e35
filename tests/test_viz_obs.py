"""Smoke tests: plotting outputs and observability utilities."""

import json
import os

import numpy as np

from pde_surrogate_tpu.utils.observability import (JsonlLogger, StepTimer,
                                                   debug_nans, profile_trace)
from pde_surrogate_tpu.viz.plot import (assemble_gif, plot_MC, plot_MC2,
                                        plot_prediction_bayes,
                                        plot_prediction_bayes2,
                                        plot_prediction_det,
                                        plot_prediction_det_animate, plot_row,
                                        save_samples, save_stats)


def _fields(rng):
    t = rng.random((3, 16, 16)).astype(np.float32)
    return t, t + 0.05 * rng.random((3, 16, 16)).astype(np.float32)


def test_plot_prediction_det(tmp_path, rng):
    t, p = _fields(rng)
    plot_prediction_det(str(tmp_path), t, p, epoch=3, index=1)
    assert (tmp_path / "pred_epoch3_1.png").exists()


def test_plot_prediction_det_accepts_nhwc(tmp_path, rng):
    t = rng.random((16, 16, 3)).astype(np.float32)
    plot_prediction_det(str(tmp_path), t, t, epoch=1, index=0)
    assert (tmp_path / "pred_epoch1_0.png").exists()


def test_plot_bayes_and_mc(tmp_path, rng):
    t, p = _fields(rng)
    var = np.abs(p) * 0.01
    plot_prediction_bayes2(str(tmp_path), t, p, var, 2, 0)
    assert (tmp_path / "pred_epoch2_0.png").exists()
    plot_MC2(str(tmp_path), t, p, var, True, 128)
    assert (tmp_path / "pred_mean_vs_MC.pdf").exists()


def test_imagegrid_variants(tmp_path, rng):
    """ImageGrid layout parity (reference utils/plot.py:276-374, 377-474)."""
    t, p = _fields(rng)
    var = np.abs(p) * 0.01
    plot_prediction_bayes(str(tmp_path), t, p, var, 4, 2)
    assert (tmp_path / "pred_at_x_epoch4_2.png").exists()
    plot_MC(str(tmp_path), t, p, var, True, 128)
    assert (tmp_path / "pred_mean_vs_MC.pdf").exists()
    plot_MC(str(tmp_path), t, p, var, False, 128, plot_fn="imshow")
    assert (tmp_path / "pred_var_vs_MC.pdf").exists()


def test_assemble_gif(tmp_path, rng):
    t, _ = _fields(rng)
    # run dirs contain glob metacharacters (e.g. "blocks[2, 2]"): the frame
    # glob must escape the directory part
    tmp_path = tmp_path / "blocks[2, 2]_lr0.5"
    tmp_path.mkdir()
    for i_plot in list(range(3)) + [10]:  # 10 checks numeric (not lex) order
        # frames must differ: PIL's gif writer drops identical frames
        p = t + 0.2 * rng.random(t.shape).astype(np.float32)
        plot_prediction_det_animate(str(tmp_path), t, p, epoch=i_plot,
                                    index=0, i_plot=i_plot)
    gif = assemble_gif(str(tmp_path))
    assert gif and gif.endswith("animation.gif") and os.path.exists(gif)
    from PIL import Image
    with Image.open(gif) as im:
        assert getattr(im, "n_frames", 1) == 4
    # fewer than 2 frames -> no gif
    assert assemble_gif(str(tmp_path), pattern="nomatch_*.png") is None


def test_save_stats_and_samples(tmp_path, rng):
    logger = {"loss": [3.0, 2.0, 1.0], "nrmse": [[0.5, 0.4, 0.3],
                                                 [0.4, 0.3, 0.2]]}
    save_stats(str(tmp_path), logger, "loss", "nrmse")
    assert (tmp_path / "loss.txt").exists()
    assert (tmp_path / "nrmse.pdf").exists()
    np.testing.assert_allclose(np.loadtxt(tmp_path / "loss.txt"), [3, 2, 1])
    imgs = rng.random((8, 3, 12, 12)).astype(np.float32)
    save_samples(str(tmp_path), imgs, 5, 0, "samples", nrow=4)
    assert (tmp_path / "epoch5_samples_c0_index0.png").exists()
    assert (tmp_path / "epoch5_samples_c2_index0.png").exists()


def test_plot_row(tmp_path, rng):
    plot_row([rng.random((8, 8)), rng.random((8, 8))], str(tmp_path), "row")
    assert (tmp_path / "row.png").exists()


def test_step_timer():
    import jax.numpy as jnp
    t = StepTimer(batch_size=4)
    t.start()
    for _ in range(5):
        t.step()
    r = t.result(fence=jnp.ones(()))
    assert r["steps"] == 5
    assert r["samples_per_sec"] > 0


def test_jsonl_logger(tmp_path):
    import jax.numpy as jnp
    log = JsonlLogger(str(tmp_path / "m.jsonl"))
    log.log({"epoch": 1, "loss": jnp.asarray(0.5)})
    log.log({"epoch": 2, "loss": 0.25})
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert lines[0]["loss"] == 0.5 and lines[1]["epoch"] == 2


def test_debug_nans_scoped():
    import jax
    before = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_profile_trace_disabled(tmp_path):
    with profile_trace(str(tmp_path / "prof"), enabled=False):
        pass
    assert not (tmp_path / "prof").exists()
