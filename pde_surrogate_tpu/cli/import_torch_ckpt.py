"""Import a reference PyTorch codec checkpoint into a framework run dir.

The reference's pretrained-checkpoint workflow
(/root/reference/scripts/download_checkpoints.sh, post_cglow.py:54-61)
saves ``run_dir/checkpoints/model_epoch{N}.pth`` plus ``args.txt``.  This
driver converts such a checkpoint into this framework's run-dir layout so
``predict_codec`` (and every other post-processing surface) can evaluate and
serve reference-trained weights directly:

  python -m pde_surrogate_tpu.cli.import_torch_ckpt \
      --torch-run-dir <reference run dir> --out-run-dir <new run dir>

or, with an explicit .pth and hyperparameters:

  python -m pde_surrogate_tpu.cli.import_torch_ckpt \
      --pth model_epoch100.pth --epoch 100 --imsize 64 --blocks 6 8 6 \
      --out-run-dir experiments/imported/run1
"""

from __future__ import annotations

import argparse
import glob
import os
import re

import jax
import jax.numpy as jnp

from ..data.hdf5 import load_args, save_args
from ..models.codec import DenseED
from ..train.checkpoint import save_checkpoint
from ..train.codec_trainer import create_state
from ..utils.torch_import import (check_tree_match, convert_codec_state_dict,
                                  convert_glow_state_dict, load_state_dict)


def import_codec_ckpt(pth: str, epoch: int, out_run_dir: str, *,
                      imsize: int, blocks, growth_rate: int = 16,
                      init_features: int = 48, drop_rate: float = 0.0,
                      upsample: str = "nearest", extra_args: dict | None = None):
    """Convert one codec .pth into ``out_run_dir`` (checkpoint + args.txt)."""
    model = DenseED(in_channels=1, out_channels=3, imsize=imsize,
                    blocks=list(blocks), growth_rate=growth_rate,
                    init_features=init_features, drop_rate=drop_rate,
                    out_activation=None, upsample=upsample)
    sample = jnp.zeros((1, imsize, imsize, 1), jnp.float32)
    state, _ = create_state(model, jax.random.key(0), sample, lr_max=1e-3,
                            total_steps=1)

    params, batch_stats = convert_codec_state_dict(load_state_dict(pth))
    problems = (check_tree_match(params, state.params)
                + check_tree_match(batch_stats, state.batch_stats))
    if problems:
        raise ValueError(
            "torch state_dict does not match the model topology:\n  "
            + "\n  ".join(problems)
            + "\n(check --blocks/--growth-rate/--init-features)")
    as_f32 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jnp.asarray(a, jnp.float32), t)
    state = state._replace(params=as_f32(params),
                           batch_stats=as_f32(batch_stats))

    run_args = {
        "imsize": imsize, "blocks": list(blocks), "growth_rate": growth_rate,
        "init_features": init_features, "drop_rate": drop_rate,
        "upsample": upsample, "imported_from": os.path.abspath(pth),
        **(extra_args or {})}
    save_args(out_run_dir, run_args)
    path = save_checkpoint(os.path.join(out_run_dir, "checkpoints"), epoch,
                           state, meta={"epoch": epoch,
                                        "imported_from": os.path.abspath(pth)})
    print(f"[import] wrote {path}")
    return out_run_dir


def import_glow_ckpt(pth: str, epoch: int, out_run_dir: str, *,
                     imsize: int, enc_blocks, flow_blocks,
                     coupling: str = "dense", LU_decompose: bool = True,
                     x_channels: int = 1, y_channels: int = 3,
                     kle: int = 512, ntrain: int = 0,
                     extra_args: dict | None = None):
    """Convert a reference cGlow .pth into a ``post_cglow``-ready run dir.

    The reference's pretrained checkpoints (scripts/download_checkpoints.sh)
    save ``{epoch, model, optimizer, logger}`` (train_cglow_reverse_kl.py:
    281-289); only the model state_dict is imported.  The run dir's
    args.txt records ``squeeze_order='reference'`` so post_cglow /
    predict_cglow rebuild the model with the torch repo's quadrant-tile
    squeeze (glow_msc.py:415-421) — the encoding those convs were trained
    on.  Forward parity: tests/test_torch_import.py.
    """
    import jax.numpy as jnp

    from ..models.glow import MultiScaleCondGlow
    from ..train.glow_trainer import create_glow_state

    model = MultiScaleCondGlow(img_size=imsize, x_channels=x_channels,
                               y_channels=y_channels,
                               enc_blocks=list(enc_blocks),
                               flow_blocks=list(flow_blocks),
                               flow_coupling=coupling,
                               LU_decompose=LU_decompose,
                               squeeze_order="reference")
    sample_y = jnp.zeros((1, imsize, imsize, y_channels), jnp.float32)
    sample_x = jnp.zeros((1, imsize, imsize, x_channels), jnp.float32)
    state, _ = create_glow_state(model, jax.random.key(0), sample_y,
                                 sample_x, lr_max=1e-3, total_steps=1)

    params, batch_stats, constants = convert_glow_state_dict(
        load_state_dict(pth))
    problems = (check_tree_match(params, state.params)
                + check_tree_match(batch_stats, state.batch_stats)
                + check_tree_match(constants, state.constants))
    if problems:
        raise ValueError(
            "torch state_dict does not match the model topology:\n  "
            + "\n  ".join(problems)
            + "\n(check --enc-blocks/--flow-blocks/--coupling)")
    as_f32 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jnp.asarray(a, jnp.float32), t)
    state = state._replace(params=as_f32(params),
                           batch_stats=as_f32(batch_stats),
                           constants=as_f32(constants))

    run_args = {
        "imsize": imsize, "x_channels": x_channels, "y_channels": y_channels,
        "enc_blocks": list(enc_blocks), "flow_blocks": list(flow_blocks),
        "coupling": coupling, "LU_decompose": LU_decompose,
        "squeeze_order": "reference", "kle": kle, "ntrain": ntrain,
        "data_dir": "./datasets", "weight_decay": 0.0,
        "imported_from": os.path.abspath(pth), **(extra_args or {})}
    save_args(out_run_dir, run_args)
    path = save_checkpoint(os.path.join(out_run_dir, "checkpoints"), epoch,
                           state, meta={"epoch": epoch,
                                        "imported_from": os.path.abspath(pth)})
    print(f"[import] wrote {path}")
    return out_run_dir


def main(argv=None):
    p = argparse.ArgumentParser(description="Import torch codec checkpoint")
    p.add_argument("--model", type=str, default="codec",
                   choices=["codec", "glow"])
    p.add_argument("--torch-run-dir", type=str, default=None,
                   help="reference run dir (reads args.txt + latest "
                        "checkpoints/model_epoch*.pth)")
    p.add_argument("--pth", type=str, default=None, help="explicit .pth file")
    p.add_argument("--epoch", type=int, default=None,
                   help="epoch label (default: parsed from the filename)")
    p.add_argument("--out-run-dir", type=str, required=True)
    p.add_argument("--imsize", type=int, default=64)
    p.add_argument("--blocks", type=int, nargs="+", default=[6, 8, 6])
    p.add_argument("--growth-rate", type=int, default=16)
    p.add_argument("--init-features", type=int, default=48)
    p.add_argument("--drop-rate", type=float, default=0.0)
    p.add_argument("--upsample", type=str, default="nearest")
    # glow-only
    p.add_argument("--enc-blocks", type=int, nargs="+", default=[3, 3, 3, 3])
    p.add_argument("--flow-blocks", type=int, nargs="+", default=[4, 4, 4, 4])
    p.add_argument("--coupling", type=str, default="dense",
                   choices=["dense", "wide"])
    p.add_argument("--no-LU-decompose", action="store_true", default=False)
    p.add_argument("--kle", type=int, default=512)
    args = p.parse_args(argv)

    if args.model == "glow":
        hp = dict(imsize=args.imsize, enc_blocks=args.enc_blocks,
                  flow_blocks=args.flow_blocks, coupling=args.coupling,
                  LU_decompose=not args.no_LU_decompose, kle=args.kle)
    else:
        hp = dict(imsize=args.imsize, blocks=args.blocks,
                  growth_rate=args.growth_rate,
                  init_features=args.init_features,
                  drop_rate=args.drop_rate, upsample=args.upsample)
    pth, extra = args.pth, {}
    if args.torch_run_dir:
        ta = load_args(args.torch_run_dir)
        if args.model == "glow":
            # reference cGlow args.txt stores the (broken type=list) block
            # flags as their default lists (train_cglow_reverse_kl.py:36-37)
            hp = dict(imsize=ta.imsize, enc_blocks=list(ta.enc_blocks),
                      flow_blocks=list(ta.flow_blocks),
                      coupling=getattr(ta, "coupling", "dense"),
                      LU_decompose=getattr(ta, "LU_decompose", True),
                      kle=getattr(ta, "kle", args.kle))
        else:
            hp = dict(imsize=ta.imsize, blocks=list(ta.blocks),
                      growth_rate=ta.growth_rate,
                      init_features=ta.init_features,
                      drop_rate=ta.drop_rate, upsample=ta.upsample)
        extra = {"torch_args": vars(ta)}
        if pth is None:
            cand = sorted(glob.glob(os.path.join(
                args.torch_run_dir, "checkpoints", "model_epoch*.pth")),
                key=lambda f: int(re.search(r"epoch(\d+)", f).group(1)))
            if not cand:
                raise FileNotFoundError(
                    f"no model_epoch*.pth under {args.torch_run_dir}")
            pth = cand[-1]
    if pth is None:
        p.error("one of --pth / --torch-run-dir is required")
    epoch = args.epoch
    if epoch is None:
        m = re.search(r"epoch(\d+)", os.path.basename(pth))
        epoch = int(m.group(1)) if m else 0
    importer = import_glow_ckpt if args.model == "glow" else import_codec_ckpt
    importer(pth, epoch, args.out_run_dir, extra_args=extra, **hp)


if __name__ == "__main__":
    main()
