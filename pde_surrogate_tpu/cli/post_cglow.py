"""Post-processing for a trained cGlow: the full UQ suite.

Reference: post_cglow.py — rebuild the model from the run dir's args.txt,
restore the checkpoint, then run prediction-at-x, distribution estimates,
test metric, reliability diagram, and uncertainty propagation against a
Monte-Carlo dataset.

Run:  python -m pde_surrogate_tpu.cli.post_cglow --run-dir <dir> \
          --ckpt-epoch 400
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.hdf5 import load_args, load_data
from ..models.glow import MultiScaleCondGlow
from ..train.checkpoint import latest_epoch, restore_checkpoint
from ..train.glow_trainer import create_glow_state
from ..uq.uq import GlowSurrogate, UQCondGlow
from ._codec_common import uq_dataset_files


def main(argv=None):
    parser = argparse.ArgumentParser(description="Post-process trained cGlow")
    parser.add_argument("--run-dir", type=str, required=True)
    parser.add_argument("--ckpt-epoch", type=int, default=None)
    parser.add_argument("--n-samples", type=int, default=20)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--n-monte-carlo", type=int, default=10000)
    parser.add_argument("--ntest", type=int, default=512)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--var-samples", type=int, default=10)
    parser.add_argument("--n-pred", type=int, default=6)
    parser.add_argument("--num-loc", type=int, default=6)
    parser.add_argument("--plot-samples", action="store_true",
                        help="plot predictive output samples per input "
                             "(reference post_cglow.py:20)")
    args = parser.parse_args(argv)

    # several large flow executables (sample/generate/propagate) compile on
    # every invocation otherwise — remote compiles cost 20-200 s each
    from ..utils.config import enable_compilation_cache
    enable_compilation_cache()

    run_args = load_args(args.run_dir)
    ckpt_dir = os.path.join(args.run_dir, "checkpoints")
    epoch = args.ckpt_epoch or latest_epoch(ckpt_dir)
    if epoch is None:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    post_dir = os.path.join(args.run_dir, f"post_proc_epoch{epoch}")
    os.makedirs(post_dir, exist_ok=True)

    model = MultiScaleCondGlow(img_size=run_args.imsize,
                               x_channels=run_args.x_channels,
                               y_channels=run_args.y_channels,
                               enc_blocks=run_args.enc_blocks,
                               flow_blocks=run_args.flow_blocks,
                               flow_coupling=getattr(run_args, "coupling",
                                                     "dense"),
                               LU_decompose=run_args.LU_decompose,
                               squeeze_factor=2,
                               squeeze_order=getattr(
                                   run_args, "squeeze_order", "subpixel"))

    # datasets: monte-carlo + val (generated on demand like the trainers);
    # family-aware — channelized/warped cGlow runs get matching UQ sets
    mc_file, test_file = uq_dataset_files(run_args, args.n_monte_carlo,
                                          args.ntest)
    mc_x, mc_y, _ = load_data(mc_file, args.n_monte_carlo, only_input=False)
    test_x, test_y, stats = load_data(test_file, args.ntest, only_input=False,
                                      return_stats=True)

    sample_y = jnp.zeros((2, run_args.imsize, run_args.imsize,
                          run_args.y_channels))
    sample_x = jnp.asarray(test_x[:2])
    # lr/steps are irrelevant for inference, but weight_decay changes the
    # opt_state pytree STRUCTURE — the template must match training's chain
    state, _ = create_glow_state(model, jax.random.key(0), sample_y, sample_x,
                                 lr_max=1e-3, total_steps=1,
                                 weight_decay=getattr(run_args,
                                                      "weight_decay", 0.0))
    state = restore_checkpoint(ckpt_dir, epoch, state)
    print(f"Loaded checkpoint at epoch {epoch}")

    surrogate = GlowSurrogate(model, state, n_samples=args.n_samples,
                              temperature=args.temperature)
    uq = UQCondGlow(surrogate, (mc_x, mc_y), (test_x, test_y),
                    stats["y_variation"], post_dir, run_args.imsize,
                    batch_size=args.batch_size, ntrain=run_args.ntrain,
                    epochs=run_args.epochs)
    uq.plot_prediction_at_x(args.n_pred, plot_samples=args.plot_samples)
    from ..viz.plot import assemble_gif
    gif = assemble_gif(os.path.join(post_dir, "predict_at_x"),
                       os.path.join(post_dir, "cglow_pred_at_x.gif"),
                       duration_ms=800)
    if gif:
        print(f"animation: {gif}")
    uq.plot_dist(args.num_loc)
    uq.test_metric(handle_nan=True)
    uq.plot_reliability_diagram()
    uq.propagate_uncertainty(var_samples=args.var_samples)
    return uq


if __name__ == "__main__":
    main()
