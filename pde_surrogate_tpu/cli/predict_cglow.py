"""Batch inference (serving) for a trained conditional-Glow run.

The reference post-processes cGlow only through the UQ suite
(post_cglow.py); there is no surface that just maps a file of permeability
inputs to predictive fields. This driver is that surface, the flow-model
sibling of predict_codec: rebuild the model from ``args.txt``, restore a
checkpoint, and write the predictive mean (and std) of p(y|x) over
``--n-samples`` draws per input to HDF5 in the reference NCHW layout —
plus rel-L2 / R^2 of the mean when the input file carries labels
(NaN-robust, like utils/uq.py:244-278 in the reference).

Run:  python -m pde_surrogate_tpu.cli.predict_cglow \
          --run-dir <dir> [--ckpt-epoch N] --input K.hdf5 --output pred.hdf5
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.hdf5 import load_args, load_data, save_dataset
from ..models.glow import MultiScaleCondGlow
from ..train.checkpoint import latest_epoch, restore_checkpoint
from ..train.glow_trainer import create_glow_state
from ..uq.uq import GlowSurrogate
from ..utils.metrics import r2_score


def main(argv=None):
    parser = argparse.ArgumentParser(description="cGlow batch inference")
    parser.add_argument("--run-dir", type=str, required=True,
                        help="training run dir (contains args.txt and "
                             "checkpoints/)")
    parser.add_argument("--ckpt-epoch", type=int, default=None,
                        help="checkpoint epoch (default: latest)")
    parser.add_argument("--input", type=str, required=True,
                        help="HDF5 with 'input' (N,1,H,W); 'output' labels "
                             "optional (metrics printed when present)")
    parser.add_argument("--output", type=str, default=None,
                        help="HDF5 to write predictive mean/std to (default: "
                             "<run-dir>/predictions_epoch<E>.hdf5)")
    parser.add_argument("--ndata", type=int, default=None,
                        help="predict only the first N samples")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--n-samples", type=int, default=20,
                        help="MC draws per input for the predictive moments")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from ..utils.config import enable_compilation_cache
    enable_compilation_cache()

    run_args = load_args(args.run_dir)
    ckpt_dir = os.path.join(args.run_dir, "checkpoints")
    epoch = args.ckpt_epoch or latest_epoch(ckpt_dir)
    if epoch is None:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")

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

    import h5py
    with h5py.File(args.input, "r") as f:
        n_total = f["input"].shape[0]
        has_labels = "output" in f
    n = min(args.ndata or n_total, n_total)
    x, y, _ = load_data(args.input, n, only_input=not has_labels)

    # lr/steps are irrelevant for inference, but weight_decay changes the
    # opt_state pytree STRUCTURE — the template must match training's chain
    sample_y = jnp.zeros((2, run_args.imsize, run_args.imsize,
                          run_args.y_channels))
    sample_x = jnp.asarray(x[:2])
    state, _ = create_glow_state(model, jax.random.key(0), sample_y, sample_x,
                                 lr_max=1e-3, total_steps=1,
                                 weight_decay=getattr(run_args,
                                                      "weight_decay", 0.0))
    state = restore_checkpoint(ckpt_dir, epoch, state)
    print(f"[predict] restored {ckpt_dir} epoch {epoch}")

    surrogate = GlowSurrogate(model, state, n_samples=args.n_samples,
                              temperature=args.temperature)
    key = jax.random.key(args.seed)
    means, stds = [], []
    for i in range(0, n, args.batch_size):
        xb = jnp.asarray(x[i:i + args.batch_size])
        mean, var = surrogate.predict(xb, jax.random.fold_in(key, i))
        means.append(np.asarray(mean, dtype=np.float32))
        stds.append(np.sqrt(np.asarray(var, dtype=np.float32)))
    mean = np.concatenate(means, 0)         # (N, H, W, C)
    std = np.concatenate(stds, 0)

    out_path = args.output or os.path.join(
        args.run_dir, f"predictions_epoch{epoch}.hdf5")
    save_dataset(out_path, np.moveaxis(x, -1, 1), np.moveaxis(mean, -1, 1))
    with h5py.File(out_path, "a") as f:
        f.create_dataset("output_std", data=np.moveaxis(std, -1, 1),
                         compression="gzip")
    print(f"[predict] wrote {mean.shape[0]} predictive mean/std fields "
          f"({args.n_samples} draws, T={args.temperature}) to {out_path}")

    if has_labels:
        # NaN-robust metrics on the predictive mean (flow samples can carry
        # non-finite rows; mirror the UQ suite's row filter)
        finite = np.isfinite(mean).all(axis=(1, 2, 3))
        n_bad = int((~finite).sum())
        if n_bad:
            print(f"[predict] {n_bad}/{len(mean)} predictions non-finite — "
                  f"excluded from metrics")
        m, yy = mean[finite], y[finite]
        err2 = ((m - yy) ** 2).sum(axis=(1, 2))
        rel_l2 = np.sqrt(err2 / (yy ** 2).sum(axis=(1, 2))).mean(0)
        variation = ((yy - yy.mean(0, keepdims=True)) ** 2).sum(
            axis=(0, 1, 2))
        r2 = np.asarray(r2_score(jnp.asarray(err2.sum(0)),
                                 jnp.asarray(variation)))
        print(f"[predict] rel-L2 per channel (predictive mean): {rel_l2}")
        print(f"[predict] R^2 per channel: {r2}")
        return mean, std, rel_l2, r2
    return mean, std, None, None


if __name__ == "__main__":
    main()
