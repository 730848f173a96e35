"""Physics-constrained codec surrogate, label-free mixed-residual training.

TPU-native driver with the reference's CLI surface
(train_codec_mixed_residual.py:37-98): same hyperparameters and defaults,
same run-dir naming, same metrics.  ``--cuda`` is replaced by
``--n-devices`` (size of the data mesh; default all local devices... or
single-device when 1).

Run:  python -m pde_surrogate_tpu.cli.train_codec_mixed_residual \
          --data grf_kle512 --ntrain 4096 --batch-size 32
"""

from __future__ import annotations

import argparse

from ..utils.config import BaseParser, int_list
from ._codec_common import run_codec_training


class Parser(BaseParser):
    def __init__(self):
        super().__init__(
            description="Learning surrogate with mixed residual norm loss")
        self.add_argument("--exp-name", type=str,
                          default="codec/mixed_residual")
        self.add_argument("--exp-dir", type=str, default="./experiments")
        # codec
        self.add_argument("--blocks", type=int_list, default=[6, 8, 6])
        self.add_argument("--growth-rate", type=int, default=16)
        self.add_argument("--init-features", type=int, default=48)
        self.add_argument("--drop-rate", type=float, default=0.0)
        self.add_argument("--upsample", type=str, default="nearest",
                          choices=["nearest", "bilinear"])
        # data
        self.add_argument("--data-dir", type=str, default="./datasets")
        self.add_argument("--data", type=str, default="grf_kle512",
                          choices=["grf_kle512", "channelized", "warped_grf"])
        self.add_argument("--kle", type=int, default=512,
                          help="KLE truncation for the grf family "
                               "(e.g. 100/128 at imsize 32)")
        self.add_argument("--ntrain", type=int, default=4096)
        self.add_argument("--ntest", type=int, default=512)
        self.add_argument("--imsize", type=int, default=64)
        # training
        self.add_argument("--run", type=int, default=1)
        self.add_argument("--epochs", type=int, default=300)
        self.add_argument("--lr", type=float, default=1e-3)
        self.add_argument("--lr-div", type=float, default=2.0)
        self.add_argument("--lr-pct", type=float, default=0.3)
        self.add_argument("--weight-decay", type=float, default=0.0)
        self.add_argument("--weight-bound", type=float, default=10.0)
        self.add_argument("--sobel-size", type=int, default=3, choices=[3, 5],
                          help="derivative stencil for the physics loss")
        self.add_argument("--physics", type=str, default="sobel",
                          choices=["sobel", "fv", "fvcg", "sobel_fvcg"],
                          help="label-free objective: 'sobel' = the "
                               "reference's mixed residual (models/darcy.py"
                               ":162-233); 'fv' = the exactly-identifiable "
                               "finite-volume residual "
                               "(ops/darcy.fv_mixed_residual_loss — "
                               "measured ill-conditioned, docs/RESULTS.md); "
                               "'fvcg' = the CG-preconditioned error "
                               "objective (ops/darcy.fv_cg_error_loss); "
                               "'sobel_fvcg' = sobel + the CG-recovered "
                               "pressure-error anchor (hybrid)")
        self.add_argument("--fvcg-weight", type=float, default=100.0,
                          help="weight of the CG pressure-error term in "
                               "the sobel_fvcg hybrid objective")
        self.add_argument("--fvcg-flux-weight", type=float, default=0.0,
                          help="weight of the flux anchor against the "
                               "CG-corrected pressure's conservative face "
                               "fluxes (ops/darcy.fv_cg_anchors; 0 = the "
                               "round-3 hybrid)")
        self.add_argument("--fvcg-iters", type=int, default=None,
                          help="CG depth of the fvcg anchors (default: "
                               "the grid size — kappa(A) ~ n^2 needs "
                               "Krylov depth ~ n)")
        self.add_argument("--dtype", type=str, default="f32",
                          choices=["f32", "bf16"],
                          help="conv compute dtype (params stay f32; bf16 "
                               "is ~1.3x faster, slightly different numerics)")
        self.add_argument("--shared-stats", action=argparse.BooleanOptionalAction,
                          default=True,
                          help="dense blocks reuse per-group BN batch moments "
                               "instead of re-reducing the concat prefix at "
                               "every layer (same math + checkpoint tree; "
                               "models/codec.DenseBlock shared_stats). Default "
                               "ON since round 4: same-seed A/B measured "
                               "accuracy parity (R2 .967/.955/.856 plain vs "
                               ".957/.953/.857 shared, logs/canon_kle512_"
                               "300ep_r4.log) at +5-7%% throughput")
        self.add_argument("--concat-free", action="store_true", default=False,
                          help="with --shared-stats: eliminate the per-layer "
                               "prefix concats too (sum-of-sliced-kernel "
                               "convs; same math + checkpoint tree; "
                               "models/codec.DenseLayerConcatFree)")
        self.add_argument("--batch-size", type=int, default=32)
        self.add_argument("--test-batch-size", type=int, default=64)
        self.add_argument("--seed", type=int, default=1)
        self.add_argument("--n-devices", type=int, default=None,
                          help="data-mesh size (None: single device)")
        self.add_argument("--find-lr", action="store_true", default=False,
                          help="run the LR-range test instead of training "
                               "(utils/practices.py:45-83)")
        self.add_argument("--no-scan-epochs", dest="scan_epochs",
                          action="store_false", default=True,
                          help="use the eager per-step hot loop instead "
                               "of one device program per epoch")
        self.add_argument("--init-from", type=str, default=None,
                          help="run dir (or 'dir:epoch') to warm-start "
                               "weights from, with a fresh optimizer and lr "
                               "schedule (cGlow --init-from semantics). The "
                               "codec is fully convolutional, so the source "
                               "may be trained at a different imsize "
                               "(coarse-to-fine). Use a distinct --run to "
                               "keep the run dir separate")
        self.add_logging_args(ckpt_freq=100, log_freq=1, plot_freq=50)

    def parse(self, argv=None):
        args = self.parse_args(argv)
        hparams = (f"{args.data}_ntrain{args.ntrain}_run{args.run}_"
                   f"bs{args.batch_size}_lr{args.lr}_epochs{args.epochs}")
        # non-default kle/imsize get their own run dirs (the reference only
        # ships 64x64 kle512 under this driver, so its naming has no slot)
        if args.kle != 512:
            hparams += f"_kle{args.kle}"
        if args.imsize != 64:
            hparams += f"_im{args.imsize}"
        # training-relevant variants get their own run dirs: checkpoints
        # trained under different physics weights / stencils / precision
        # must never collide (a --ckpt-epoch resume would silently mix them)
        if args.weight_bound != 10.0:
            hparams += f"_wb{args.weight_bound:g}"
        if args.sobel_size != 3:
            hparams += f"_sobel{args.sobel_size}"
        if args.physics != "sobel":
            hparams += f"_{args.physics}"
            if args.physics == "sobel_fvcg" and args.fvcg_weight != 100.0:
                hparams += f"_w{args.fvcg_weight:g}"
            if args.physics == "sobel_fvcg" and args.fvcg_flux_weight != 0.0:
                hparams += f"_fw{args.fvcg_flux_weight:g}"
            if args.fvcg_iters is not None:
                hparams += f"_cg{args.fvcg_iters}"
        if args.upsample != "nearest":
            hparams += f"_{args.upsample}"
        if args.dtype != "f32":
            hparams += f"_{args.dtype}"
        # concat_free runs on the shared-stats path (DenseBlock._call_shared).
        # shared_stats is the round-4 default (measured accuracy parity at
        # +5-7% throughput); only the non-default impls get a dir suffix so
        # pre-flip canonical run dirs stay resumable unchanged.
        if args.concat_free:
            args.shared_stats = True
            hparams += "_cf"
        elif not args.shared_stats:
            hparams += "_nss"
        assert args.ntrain % args.batch_size == 0 and \
            args.ntest % args.test_batch_size == 0
        return self.finalize(args, hparams)


def main(argv=None):
    args = Parser().parse(argv)
    if args.find_lr:
        from ._codec_common import run_find_lr
        return run_find_lr(args, loss_kind="mixed_residual")
    return run_codec_training(args, loss_kind="mixed_residual")


if __name__ == "__main__":
    main()
