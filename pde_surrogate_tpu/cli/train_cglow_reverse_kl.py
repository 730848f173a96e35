"""Probabilistic surrogate: multiscale conditional Glow, reverse-KL training.

Label-free: the loss is beta * (physics residual + boundary) on generated
samples plus the predictive entropy (bits/pixel).  CLI parity with the
reference (train_cglow_reverse_kl.py:28-105) including resume semantics;
``--no-LU-decompose`` switches the 1x1 convs to the dense-inverse variant
(LU is the default, as in the reference).

Run:  python -m pde_surrogate_tpu.cli.train_cglow_reverse_kl \
          --beta 150 --ntrain 4096 --kle 100 --imsize 32
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.hdf5 import load_data, save_args
from ..data.pipeline import DeviceDataset
from ..models.codec import module_size
from ..models.glow import MultiScaleCondGlow
from ..ops.filters import SobelFilter
from ..parallel.mesh import batch_sharding, data_mesh, replicate
from ..train.checkpoint import (latest_epoch, restore_checkpoint,
                                save_checkpoint)
from ..train.glow_trainer import (create_glow_state, data_init_actnorm,
                                  glow_lr, make_glow_eval_step,
                                  make_reverse_kl_step)
from ..utils.config import BaseParser, int_list
from ..utils.metrics import r2_score
from ..viz.plot import plot_prediction_bayes2, save_samples, save_stats
from ._codec_common import resolve_dataset_files


class Parser(BaseParser):
    def __init__(self):
        super().__init__(description="Training multiscale conditional Glows "
                                     "with reverse KLD loss")
        self.add_argument("--exp-name", type=str, default="cglow/reverse_kld")
        self.add_argument("--exp-dir", type=str, default="./experiments")
        # cglow
        self.add_argument("--enc-blocks", type=int_list, default=[3, 4, 4])
        self.add_argument("--flow-blocks", type=int_list, default=[6, 6, 6])
        self.add_argument("--no-LU-decompose", action="store_true",
                          default=False)
        self.add_argument("--coupling", type=str, default="dense",
                          choices=["dense", "wide"],
                          help="affine-coupling net type "
                               "(reference README.md:70)")
        self.add_argument("--squeeze-order", type=str, default=None,
                          choices=["subpixel", "reference"],
                          help="squeeze channel encoding (models/flow."
                               "Squeeze). Default: inherited from the "
                               "--resume/--init-from source run dir's "
                               "args.txt (imported reference checkpoints "
                               "record 'reference'), else 'subpixel'")
        # data
        self.add_argument("--data-dir", type=str, default="./datasets")
        self.add_argument("--data", type=str, default="grf_kle512",
                          choices=["grf_kle512", "channelized", "warped_grf"],
                          help="input-field family (codec-driver parity; "
                               "the reference cGlow only ships GRF-KLE — "
                               "channelized/warped extend the probabilistic "
                               "surrogate to the discontinuous families the "
                               "fvcg anchors cracked)")
        self.add_argument("--kle", type=int, default=100)
        self.add_argument("--ntrain", type=int, default=4096)
        self.add_argument("--ntest", type=int, default=512)
        self.add_argument("--x-channels", type=int, default=1)
        self.add_argument("--y-channels", type=int, default=3)
        self.add_argument("--imsize", type=int, default=32)
        # training
        self.add_argument("--data-init", action="store_true", default=False)
        self.add_argument("--epochs", type=int, default=400)
        self.add_argument("--lr", type=float, default=1.5e-3)
        self.add_argument("--lr-div", type=float, default=2.0)
        self.add_argument("--lr-pct", type=float, default=0.3)
        self.add_argument("--beta", type=float, default=150.0)
        self.add_argument("--weight-decay", type=float, default=0.0)
        self.add_argument("--weight-bound", type=float, default=50.0)
        self.add_argument("--physics", type=str, default="sobel",
                          choices=["sobel", "sobel_fvcg", "fvcg"],
                          help="per-sample physics loss: 'sobel' = the "
                               "reference's mixed residual; 'sobel_fvcg' "
                               "adds the codec hybrid's label-free CG "
                               "anchors (ops/darcy.fv_cg_anchors) to every "
                               "drawn sample; 'fvcg' = the pure CG-anchor "
                               "objective (no Sobel terms — the recommended "
                               "codec recipe on discontinuous K)")
        self.add_argument("--fvcg-weight", type=float, default=100.0,
                          help="weight of the CG pressure-error anchor "
                               "under --physics sobel_fvcg")
        self.add_argument("--fvcg-flux-weight", type=float, default=0.0,
                          help="weight of the CG-corrected-pressure flux "
                               "anchor under --physics sobel_fvcg")
        self.add_argument("--fvcg-iters", type=int, default=None,
                          help="CG depth of the fvcg anchors (default: "
                               "the grid size)")
        self.add_argument("--batch-size", type=int, default=32)
        self.add_argument("--test-batch-size", type=int, default=64)
        self.add_argument("--seed", type=int, default=1)
        self.add_argument("--n-devices", type=int, default=None)
        self.add_argument("--no-scan-epochs", dest="scan_epochs",
                          action="store_false", default=True,
                          help="use the eager per-step hot loop instead of "
                               "one device program per epoch. (The round-2 "
                               "'scan ~3.5x slower' anomaly was the generic "
                               "epoch fn dragging the loop-invariant LU "
                               "constants through the scan carry; "
                               "make_glow_epoch_fn carries only the trained "
                               "leaves and scan now matches eager on-device "
                               "while saving per-step tunnel dispatches — "
                               "logs/glow_scan_probe_r3.log)")
        self.add_argument("--resume", action="store_true", default=False)
        self.add_argument("--init-from", type=str, default=None,
                          help="run dir (or 'dir:epoch') to warm-start "
                               "weights from, with a FRESH optimizer and lr "
                               "schedule — the safe way to extend a finished "
                               "OneCycle run (use a lower --lr)")
        self.add_logging_args(ckpt_freq=25, log_freq=1, plot_freq=25)

    def parse(self, argv=None):
        args = self.parse_args(argv)
        args.LU_decompose = not args.no_LU_decompose
        assert len(args.enc_blocks) == len(args.flow_blocks)
        # drop-last batching would silently exclude the remainder from
        # training and skew eval metrics (SSE summed over fewer samples
        # than y_variation was computed on) — same gate as the codec
        # drivers (train_codec_mixed_residual.py:84-85)
        assert args.ntrain % args.batch_size == 0, \
            "ntrain must be divisible by batch-size"
        assert args.ntest % args.test_batch_size == 0, \
            "ntest must be divisible by test-batch-size"
        # grf keeps the historical kle<k> head so existing run dirs stay
        # resumable; the new families lead with the family name instead
        head = (f"kle{args.kle}" if args.data == "grf_kle512"
                else args.data)
        hparams = (f"{head}_ntrain{args.ntrain}_"
                   f"ENC_blocks{args.enc_blocks}_FLOW_blocks{args.flow_blocks}_"
                   f"wb{args.weight_bound}_beta{args.beta}_"
                   f"batch{args.batch_size}_lr{args.lr}_epochs{args.epochs}")
        # non-default sizes get their own run dirs — without this, e.g.
        # kle100@32 and kle100@64 with equal hparams silently share a dir
        # (checkpoint mixing); 32 is the reference default and stays
        # suffix-free so historical @32 dirs remain resumable
        if args.imsize != 32:
            hparams += f"_im{args.imsize}"
        if args.data_init:
            hparams = hparams + "_data_init"
        # training-relevant objective variants get their own run dirs
        # (same convention as the codec driver).  The anchor weights only
        # name the dir under sobel_fvcg — the pure-fvcg step uses
        # unweighted err_u + err_flux, so suffixing them there would mint
        # differently-named dirs for mathematically identical runs
        # (advisor finding, ADVICE.md r4)
        if args.physics != "sobel":
            hparams += f"_{args.physics}"
            if args.physics == "sobel_fvcg":
                if args.fvcg_weight != 100.0:
                    hparams += f"_w{args.fvcg_weight:g}"
                if args.fvcg_flux_weight != 0.0:
                    hparams += f"_fw{args.fvcg_flux_weight:g}"
            elif args.fvcg_weight != 100.0 or args.fvcg_flux_weight != 0.0:
                raise SystemExit(
                    "--fvcg-weight/--fvcg-flux-weight only apply to "
                    "--physics sobel_fvcg; the pure fvcg objective is "
                    "unweighted err_u + err_flux, so these flags would be "
                    "silent no-ops")
            if args.fvcg_iters is not None:
                hparams += f"_cg{args.fvcg_iters}"
        # pre-round-4 runs at imsize != 32 predate the _im{N} suffix; a
        # --resume that recomputes the new name must find them rather than
        # silently start a fresh run dir (advisor finding, ADVICE.md r4)
        if (args.resume or args.ckpt_epoch is not None) and args.imsize != 32:
            hp = ("debug/" + hparams) if args.debug else hparams
            new_dir = os.path.join(args.exp_dir, args.exp_name, hp)
            legacy = hparams.replace(f"_im{args.imsize}", "", 1)
            hp_leg = ("debug/" + legacy) if args.debug else legacy
            legacy_dir = os.path.join(args.exp_dir, args.exp_name, hp_leg)
            if not os.path.exists(os.path.join(new_dir, "args.txt")) \
                    and os.path.exists(os.path.join(legacy_dir, "args.txt")):
                print(f"--resume: using legacy (pre-_im{args.imsize}) run "
                      f"dir {legacy_dir}")
                hparams = legacy
        # squeeze_order must match the weights being loaded: the param
        # trees of both orders are identical, so loading
        # reference-order weights (import_torch_ckpt --model glow) into a
        # subpixel-order model is silent numerical corruption.  Resolve
        # from the source run dir's args.txt BEFORE finalize overwrites
        # it (resume reuses the run dir).
        recorded = None
        if args.resume or args.ckpt_epoch is not None:
            hp = ("debug/" + hparams) if args.debug else hparams
            prior = os.path.join(args.exp_dir, args.exp_name, hp, "args.txt")
            if os.path.exists(prior):
                with open(prior) as f:
                    recorded = json.load(f).get("squeeze_order")
        elif args.init_from:
            src = args.init_from.partition(":")[0]
            prior = os.path.join(src, "args.txt")
            if os.path.exists(prior):
                with open(prior) as f:
                    recorded = json.load(f).get("squeeze_order")
        if recorded is not None:
            if args.squeeze_order is not None \
                    and args.squeeze_order != recorded:
                raise ValueError(
                    f"--squeeze-order {args.squeeze_order!r} conflicts with "
                    f"the source run dir's recorded {recorded!r}")
            args.squeeze_order = recorded
        if args.squeeze_order is None:
            args.squeeze_order = "subpixel"
        args = self.finalize(args, hparams)
        # resume: pick up the last recorded checkpoint epoch
        if args.resume and args.ckpt_epoch is None:
            args.ckpt_epoch = latest_epoch(args.ckpt_dir)
        return args


def main(argv=None):
    args = Parser().parse(argv)
    args.train_dir = os.path.join(args.run_dir, "training")
    args.pred_dir = os.path.join(args.train_dir, "predictions")
    os.makedirs(args.pred_dir, exist_ok=True)

    # datasets (generated on demand: inputs for training, solver-labeled
    # val) — family resolution shared with the codec drivers
    train_file, test_file = resolve_dataset_files(
        args, need_train_output=args.data_init)

    x_train, y_train, _ = load_data(train_file, args.ntrain,
                                    only_input=not args.data_init)
    x_test, y_test, stats = load_data(test_file, args.ntest, only_input=False,
                                      return_stats=True)
    y_variation = stats["y_variation"]
    print(f"Test output variation per channel: {y_variation}")
    n_out_pixels = int(np.prod(y_test.shape[1:]))
    print(f"# out pixels per output: {n_out_pixels}")

    model = MultiScaleCondGlow(img_size=args.imsize,
                               x_channels=args.x_channels,
                               y_channels=args.y_channels,
                               enc_blocks=args.enc_blocks,
                               flow_blocks=args.flow_blocks,
                               flow_coupling=args.coupling,
                               LU_decompose=args.LU_decompose,
                               squeeze_factor=2,
                               squeeze_order=args.squeeze_order)

    mesh = data_mesh(args.n_devices) if args.n_devices else None
    sharding = batch_sharding(mesh) if mesh else None
    train_ds = DeviceDataset(x_train, batch_size=args.batch_size,
                             key=args.seed, sharding=sharding)
    test_ds = DeviceDataset(x_test, y_test, batch_size=args.test_batch_size,
                            key=args.seed + 1, sharding=sharding,
                            shuffle=False)

    total_steps = args.epochs * len(train_ds)
    sample_y = jnp.zeros((2, args.imsize, args.imsize, args.y_channels))
    sample_x = jnp.asarray(x_train[:2])
    state, tx = create_glow_state(model, jax.random.key(args.seed), sample_y,
                                  sample_x, lr_max=args.lr,
                                  total_steps=total_steps,
                                  div_factor=args.lr_div,
                                  pct_start=args.lr_pct,
                                  weight_decay=args.weight_decay)
    n_params, n_layers = module_size(state.params)
    print(f"({n_params}, {n_layers})")

    sobel = SobelFilter(args.imsize, correct=True)
    train_step = make_reverse_kl_step(model, tx, sobel, args.beta,
                                      args.weight_bound, n_out_pixels,
                                      physics=args.physics,
                                      fvcg_weight=args.fvcg_weight,
                                      fvcg_flux_weight=args.fvcg_flux_weight,
                                      fvcg_iters=args.fvcg_iters)
    eval_one = make_glow_eval_step(model, sobel, args.beta,
                                   args.weight_bound, n_out_pixels)
    eval_mean = make_glow_eval_step(model, sobel, args.beta,
                                    args.weight_bound, n_out_pixels,
                                    n_samples=20)

    logger = {"loss_train": [], "loss_test": [], "nrmse_test": [],
              "r2_test": [], "entropy_train": [], "entropy_test": []}
    start_epoch = 1
    warm_started = False
    if args.init_from and args.ckpt_epoch is None:
        # warm start: params/batch_stats/constants only, fresh optimizer +
        # schedule.  Extending a finished OneCycle run via --resume into a
        # longer-schedule run dir is UNSAFE: Adam's second moments restore
        # from the cooled-down phase (tiny v) and the longer schedule
        # restarts at high lr -> the flow blows up on the first steps
        # (measured: NaN from the first resumed epoch,
        # logs/cglow_kle512_im64_resume400.log).
        src, _, ep = args.init_from.partition(":")
        src_ckpt = os.path.join(src, "checkpoints")
        ep = int(ep) if ep else latest_epoch(src_ckpt)
        loaded = restore_checkpoint(src_ckpt, ep, state)
        state = state._replace(params=loaded.params,
                               batch_stats=loaded.batch_stats,
                               constants=loaded.constants)
        warm_started = True
        print(f"Warm-started weights from {src_ckpt} epoch {ep}")
    if args.ckpt_epoch is not None:
        state, meta = restore_checkpoint(args.ckpt_dir, args.ckpt_epoch,
                                         state, with_meta=True)
        logger = meta.get("logger", logger)
        start_epoch = args.ckpt_epoch + 1
        print(f"Loaded checkpoint at epoch {args.ckpt_epoch}")

    initialized = start_epoch > 1 or warm_started
    if args.data_init and not initialized:
        xb = jnp.asarray(x_train[:args.batch_size])
        yb = jnp.asarray(y_train[:args.batch_size])
        state = data_init_actnorm(model, state, yb, xb)
        initialized = True
        print("Finished data initialization of Actnorm")

    if mesh:
        state = replicate(state, mesh)

    # scan-epochs: the whole eval set as ONE device program per eval epoch
    # (make_glow_eval_epoch_fn) — the eager loop pays ~8 tunnel round
    # trips per epoch.  Plot epochs fall back to eager (they need the
    # first batch's tensors anyway).
    eval_epoch_one = eval_epoch_mean = eval_idx = None
    if args.scan_epochs:
        from ..train.glow_trainer import make_glow_eval_epoch_fn
        eval_epoch_one = make_glow_eval_epoch_fn(eval_one.core, sharding)
        eval_epoch_mean = make_glow_eval_epoch_fn(eval_mean.core, sharding)
        eval_idx = test_ds.epoch_indices(0)   # shuffle=False: epoch-invariant

    def test(epoch, state):
        # entropy is the batch mean (the reference logged only the last
        # batch's — and in fact the *training* loop's, a real bug:
        # train_cglow_reverse_kl.py:177,185).  Accumulate on device; one
        # host sync per eval (per-batch float() costs a tunnel round-trip).
        want_plot = (not args.no_plot
                     and (epoch % args.plot_freq == 0
                          or epoch == args.epochs))
        plot_batch = None
        if eval_epoch_one is not None and not want_plot:
            fn = eval_epoch_mean if epoch % 10 == 0 else eval_epoch_one
            base = jax.random.key(args.seed + 7)
            keys = jax.vmap(lambda d: jax.random.fold_in(base, d))(
                epoch * 1000 + jnp.arange(len(test_ds)))
            ms = fn(state, eval_idx, keys, *test_ds.arrays)
            loss_test = float(jnp.mean(ms["loss"]))
            ent = float(jnp.mean(ms["neg_entropy"]))
            relative_l2 = np.asarray(
                ms["rel_l2"].reshape(-1, ms["rel_l2"].shape[-1]).mean(0))
            r2 = np.asarray(r2_score(
                ms["sse"].reshape(-1, ms["sse"].shape[-1]).sum(0),
                jnp.asarray(y_variation)))
        else:
            losses, ents, rel, sse = [], [], [], []
            step_fn = eval_mean if epoch % 10 == 0 else eval_one
            for i, (x, y) in enumerate(test_ds.batches(epoch)):
                key = jax.random.fold_in(jax.random.key(args.seed + 7),
                                         epoch * 1000 + i)
                out = step_fn(state, x, y, key)
                losses.append(out["loss"])
                ents.append(out["neg_entropy"])
                rel.append(out["rel_l2"])
                sse.append(out["sse"])
                if i == 0:
                    plot_batch = (x, y)  # device refs; fetched iff plotting
            loss_test = float(jnp.mean(jnp.stack(losses)))
            ent = float(jnp.mean(jnp.stack(ents)))
            relative_l2 = np.asarray(jnp.concatenate(rel, 0).mean(0))
            r2 = np.asarray(r2_score(jnp.concatenate(sse, 0).sum(0),
                                     jnp.asarray(y_variation)))
        print(f"Epoch {epoch}: test r2-score: {r2}")
        print(f"Epoch {epoch}: test relative l2: {relative_l2}")
        if want_plot and plot_batch is not None:
            x_np, y_np = np.asarray(plot_batch[0]), np.asarray(plot_batch[1])
            n_show = 6 if epoch == args.epochs else 2
            idx = np.random.permutation(len(x_np))[:n_show]
            for i in idx:
                xb = jnp.asarray(x_np[[i]])
                key = jax.random.fold_in(jax.random.key(1234), int(i))
                samples = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats,
                     "constants": state.constants},
                    xb, 20, key, temperature=1.0, train=False,
                    method=model.sample)
                pred_mean = np.asarray(samples.mean(axis=0))[0]
                pred_var = np.asarray(samples.var(axis=0))[0]
                plot_prediction_bayes2(args.pred_dir, y_np[i], pred_mean,
                                       pred_var, epoch, int(i))
                save_samples(args.pred_dir,
                             np.concatenate([y_np[[i]],
                                             np.asarray(samples[:15, 0])]),
                             epoch, int(i), "samples", nrow=4)
        if epoch % args.log_freq == 0:
            logger["loss_test"].append(loss_test)
            logger["r2_test"].append(r2.tolist())
            logger["nrmse_test"].append(relative_l2.tolist())
            logger["entropy_test"].append(-ent)

    # scan-epochs default: one device program per epoch, with the
    # loop-invariant constants/key OUT of the scan carry (the round-2
    # anomaly — 571.8 vs 25.5 ms/step — was carry-copying them); same
    # math/keys as eager (per-step keys fold the counter), equal to
    # executable-level float reassociation
    if args.scan_epochs:
        from ..train.glow_trainer import make_glow_epoch_fn
        epoch_fn = make_glow_epoch_fn(train_step.core, sharding)

    print("Start training..." + "." * 54)
    tic = time.time()
    for epoch in range(start_epoch, args.epochs + 1):
        if args.scan_epochs:
            state, metrics = epoch_fn(state, train_ds.epoch_indices(epoch),
                                      *train_ds.arrays)
            loss_stack, ent_stack = metrics["loss"], metrics["neg_entropy"]
        else:
            step_metrics = []
            for (x,) in train_ds.batches(epoch):
                state, metrics = train_step(state, x)
                step_metrics.append((metrics["loss"],
                                     metrics["neg_entropy"]))
            loss_stack = jnp.stack([m for m, _ in step_metrics])
            ent_stack = jnp.stack([e for _, e in step_metrics])
        loss_train = float(jnp.mean(loss_stack))
        neg_ent = float(ent_stack[-1])
        print(f"Epoch {epoch}: training loss: {loss_train:.6f}, "
              f"neg entropy {neg_ent:.6f}, lr {glow_lr(state):.6f}")
        if epoch % args.log_freq == 0:
            logger["loss_train"].append(loss_train)
            logger["entropy_train"].append(-neg_ent)
        if epoch % args.ckpt_freq == 0:
            save_checkpoint(args.ckpt_dir, epoch, state,
                            meta={"epoch": epoch, "logger": logger})
            args.ckpt_epoch = epoch
            save_args(args.run_dir, args)
        test(epoch, state)

    training_time = time.time() - tic
    print(f"Finished training {args.epochs} epochs with {args.ntrain} data "
          f"using {training_time / 60:.2f} mins")
    save_stats(args.train_dir, logger, "loss_train", "loss_test",
               "nrmse_test", "r2_test", "entropy_test", "entropy_train")
    args.training_time = training_time
    args.n_params, args.n_layers = n_params, n_layers
    save_args(args.run_dir, args)
    return state, logger


if __name__ == "__main__":
    main()
