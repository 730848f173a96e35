"""Batch inference (serving) for a trained DenseED codec run.

The reference ships post-processing only for the cGlow model (post_cglow.py);
its deterministic codecs can only be evaluated inside the training script.
This driver is the missing serving surface: rebuild the model from a run
dir's ``args.txt``, restore a checkpoint, and predict (u, flux_hor, flux_ver)
fields for a whole HDF5 file of permeability inputs in one scan of jitted
batches — writing the reference's NCHW dataset layout back out, plus metrics
when the input file carries labels.

Run:  python -m pde_surrogate_tpu.cli.predict_codec \
          --run-dir <dir> [--ckpt-epoch N] --input K.hdf5 --output pred.hdf5
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.hdf5 import load_args, load_data, save_dataset
from ..models.codec import DenseED
from ..train.checkpoint import latest_epoch, restore_checkpoint
from ..train.codec_trainer import create_state
from ..utils.metrics import r2_score


def main(argv=None):
    parser = argparse.ArgumentParser(description="Codec batch inference")
    parser.add_argument("--run-dir", type=str, required=True,
                        help="training run dir (contains args.txt and "
                             "checkpoints/)")
    parser.add_argument("--ckpt-epoch", type=int, default=None,
                        help="checkpoint epoch (default: latest; the "
                             "training log prints the label-free "
                             "consistency-selected epoch)")
    parser.add_argument("--select-consistency", action="store_true",
                        help="pick the checkpoint with the lowest recorded "
                             "flux-pressure consistency (the label-free "
                             "u-drift detector, docs/RESULTS.md) instead of "
                             "the latest epoch")
    parser.add_argument("--input", type=str, required=True,
                        help="HDF5 with 'input' (N,1,H,W); 'output' labels "
                             "optional (metrics printed when present)")
    parser.add_argument("--output", type=str, default=None,
                        help="HDF5 to write predictions to (default: "
                             "<run-dir>/predictions_epoch<E>.hdf5)")
    parser.add_argument("--ndata", type=int, default=None,
                        help="predict only the first N samples")
    parser.add_argument("--batch-size", type=int, default=64)
    args = parser.parse_args(argv)

    from ..utils.config import enable_compilation_cache
    enable_compilation_cache()

    run_args = load_args(args.run_dir)
    ckpt_dir = os.path.join(args.run_dir, "checkpoints")
    epoch = args.ckpt_epoch or latest_epoch(ckpt_dir)
    if epoch is None:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    if args.select_consistency:
        # label-free drift-aware selection: every checkpoint's meta carries
        # the (epoch, flux_pressure_consistency) history recorded at save
        # time; argmin separates drifted from clean u (docs/RESULTS.md)
        import json
        from ..train.checkpoint import (_meta_file, latest_meta_epoch,
                                        select_consistency_epoch)
        if args.ckpt_epoch is not None:
            print(f"[predict] note: --ckpt-epoch {args.ckpt_epoch} only "
                  f"bounds the history --select-consistency searches; the "
                  f"restored epoch is the consistency argmin")
        meta_epoch = latest_meta_epoch(ckpt_dir, at_or_below=epoch)
        if meta_epoch is None:
            raise FileNotFoundError(
                f"no model_epoch*.json sidecar at or below epoch {epoch} in "
                f"{ckpt_dir} — --select-consistency needs the checkpoint "
                f"meta written by the training driver")
        if meta_epoch != epoch:
            print(f"[predict] epoch {epoch} has no meta sidecar; reading "
                  f"history from epoch {meta_epoch}")
        with open(_meta_file(ckpt_dir, meta_epoch)) as f:
            history = json.load(f).get("ckpt_consistency", [])
        selected = select_consistency_epoch(history)
        if selected is None:
            raise ValueError("no finite consistency records in the "
                             "checkpoint meta")
        epoch, cons = selected
        print(f"[predict] consistency-selected epoch {epoch} "
              f"(flux-pressure consistency {cons:.4f})")

    dtype = jnp.bfloat16 if getattr(run_args, "dtype", "f32") == "bf16" \
        else None
    model = DenseED(in_channels=1, out_channels=3, imsize=run_args.imsize,
                    blocks=run_args.blocks, growth_rate=run_args.growth_rate,
                    init_features=run_args.init_features,
                    drop_rate=run_args.drop_rate, out_activation=None,
                    upsample=run_args.upsample, dtype=dtype)

    import h5py
    with h5py.File(args.input, "r") as f:
        n_total = f["input"].shape[0]
        has_labels = "output" in f
    n = min(args.ndata or n_total, n_total)
    x, y, _ = load_data(args.input, n, only_input=not has_labels)

    # template state (lr/steps are irrelevant for inference, but
    # weight_decay changes the opt_state pytree STRUCTURE — the restore
    # template must match the training chain or from_bytes raises)
    sample = jnp.asarray(x[: max(args.batch_size // 8, 1)])
    state, _ = create_state(
        model, jax.random.key(0), sample, lr_max=1e-3, total_steps=1,
        weight_decay=getattr(run_args, "weight_decay", 0.0))
    state = restore_checkpoint(ckpt_dir, epoch, state)
    print(f"[predict] restored {ckpt_dir} epoch {epoch}")

    @jax.jit
    def forward(params, batch_stats, xb):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           xb, train=False)

    outs = []
    for i in range(0, n, args.batch_size):
        xb = jnp.asarray(x[i:i + args.batch_size])
        outs.append(np.asarray(forward(state.params, state.batch_stats, xb),
                               dtype=np.float32))
    pred = np.concatenate(outs, 0)          # (N, H, W, 3)

    out_path = args.output or os.path.join(
        args.run_dir, f"predictions_epoch{epoch}.hdf5")
    save_dataset(out_path, np.moveaxis(x, -1, 1), np.moveaxis(pred, -1, 1))
    print(f"[predict] wrote {pred.shape[0]} predictions to {out_path}")

    if has_labels:
        err2 = ((pred - y) ** 2).sum(axis=(1, 2))
        rel_l2 = np.sqrt(err2 / (y ** 2).sum(axis=(1, 2))).mean(0)
        variation = ((y - y.mean(0, keepdims=True)) ** 2).sum(axis=(0, 1, 2))
        r2 = np.asarray(r2_score(jnp.asarray(err2.sum(0)),
                                 jnp.asarray(variation)))
        print(f"[predict] rel-L2 per channel: {rel_l2}")
        print(f"[predict] R^2 per channel: {r2}")
        return pred, rel_l2, r2
    return pred, None, None


if __name__ == "__main__":
    main()
