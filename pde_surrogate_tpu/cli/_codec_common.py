"""Shared machinery for the DenseED codec drivers.

Both reference drivers share one skeleton (SURVEY.md section 3.1): data
loading, Adam + OneCycle, an epoch loop of jitted steps, a test() pass with
NRMSE/R^2 against solver-labeled data, periodic checkpoints/plots, and a
final stats dump.  This module implements that skeleton once; the drivers
select the loss (mixed-residual vs MLE).

Dataset availability: the reference downloads FEniCS-solved datasets; this
framework generates them on demand (GRF-KLE inputs + the finite-volume
solver as the labeled-data factory) when the HDF5 files are missing.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.grf import sample_channelized, sample_kle
from ..data.hdf5 import dataset_path, load_data, save_dataset
from ..data.pipeline import DeviceDataset
from ..models.codec import DenseED, module_size
from ..ops.filters import SobelFilter
from ..parallel.mesh import batch_sharding, data_mesh, replicate
from ..solvers.fd_darcy import solve_darcy_batch_fast
from ..train.checkpoint import (latest_epoch, restore_checkpoint,
                                save_checkpoint)
from ..train.codec_trainer import (create_state, current_lr, make_epoch_fn,
                                   make_eval_epoch_fn, make_eval_step,
                                   make_mixed_residual_step, make_mle_step)
from ..utils.metrics import r2_score
from ..viz.plot import plot_prediction_det, save_stats

__all__ = ["ensure_dataset", "resolve_dataset_files", "uq_dataset_files",
           "run_codec_training",
           "run_find_lr"]


def _generate_inputs(data: str, n: int, imsize: int, kle: int, seed: int):
    if data.startswith("grf"):
        return sample_kle(n, imsize, kle, rng=seed)
    if data == "channelized":
        return sample_channelized(n, imsize, rng=seed)
    if data == "warped_grf":
        from ..data.grf import sample_warped_grf
        return sample_warped_grf(n, imsize, rng=seed)
    raise ValueError(f"unknown data family: {data}")


def ensure_dataset(path: str, data: str, n: int, imsize: int, kle: int,
                   seed: int, with_output: bool, solve_batch: int = 64):
    """Generate-and-cache a dataset file if absent.

    Labeled sets are solved with the batched finite-volume Darcy solver
    (replaces the reference's downloaded FEniCS outputs).
    """
    if os.path.isfile(path):
        import h5py
        with h5py.File(path, "r") as f:
            have_output = "output" in f
            have_n = f["input"].shape[0]
        if have_n >= n and (have_output or not with_output):
            return
        if have_n >= n and with_output and not have_output:
            # Label augmentation is design-preserving: solve the FV labels
            # for the inputs ALREADY on disk and attach them in place.
            # (The hard guard below only protects the LHS input design —
            # e.g. an inputs-only file made for label-free training later
            # needed by the supervised-MLE control at the same size.)
            import h5py
            print(f"[data] attaching FV labels to existing {path} "
                  f"({have_n} samples, imsize {imsize})...")
            with h5py.File(path, "r") as f:
                k = f["input"][()]  # (N, 1, H, W)
            outs = []
            for i in range(0, have_n, solve_batch):
                batch = jnp.asarray(k[i:i + solve_batch, 0])
                outs.append(np.asarray(solve_darcy_batch_fast(batch)))
            with h5py.File(path, "a") as f:
                f.create_dataset("output", data=np.concatenate(outs, 0),
                                 dtype="f4", compression="gzip")
            print(f"[data] labels attached to {path}")
            return
        # NEVER silently regenerate: LHS designs are not prefix-stable, so a
        # bigger design would replace the existing samples under the same
        # canonical name and break reproducibility of earlier runs against
        # the file on disk (solve_conv.ensure_test_dataset documents the
        # byte-identity invariant this protects).
        need = "labels" if (with_output and not have_output) else f"{n} samples"
        raise FileExistsError(
            f"{path} exists with {have_n} samples"
            f"{' (no labels)' if not have_output else ''} but this run needs "
            f"{need}. Regenerating would REPLACE its contents with a "
            f"different LHS design. Delete the file to regenerate, or create "
            f"the full-size version explicitly with "
            f"`python -m pde_surrogate_tpu.cli.make_dataset`.")
    print(f"[data] generating {path} ({n} samples, imsize {imsize})...")
    k = _generate_inputs(data, n, imsize, kle, seed)
    y = None
    if with_output:
        outs = []
        for i in range(0, n, solve_batch):
            batch = jnp.asarray(k[i:i + solve_batch])
            outs.append(np.asarray(solve_darcy_batch_fast(batch)))
        y = np.concatenate(outs, 0)  # (N, 3, H, W)
    save_dataset(path, k[:, None, :, :], y)
    print(f"[data] wrote {path}")


def resolve_dataset_files(args, need_train_output: bool = False):
    """Reference dataset paths per family (train_codec_mixed_residual.py:128-139).

    ``need_train_output``: MLE training needs solver labels for the training
    split too; label-free physics training generates inputs only.
    """
    if args.data == "grf_kle512":
        # --kle overrides the KLE truncation (512 = reference default);
        # unblocks the 32x32 kle100/128 family matrix in BASELINE.md.
        kle = getattr(args, "kle", None) or 512
        train = dataset_path(args.data_dir, args.imsize,
                             f"kle{kle}_lhs10000_train")
        test = dataset_path(args.data_dir, args.imsize,
                            f"kle{kle}_lhs1000_val")
        ntrain_total, ntest_total = 10000, 1000
        family = "grf"
    elif args.data == "channelized":
        train = dataset_path(args.data_dir, args.imsize,
                             "channel_ng64_n4096_train")
        test = dataset_path(args.data_dir, args.imsize,
                            "channel_ng64_n512_test")
        ntrain_total, ntest_total = 4096, 512
        kle, family = 0, "channelized"
    elif args.data == "warped_grf":
        # reference ships one warped_gp_ng64_n1000.hdf5 (README.md:22-34);
        # train/test splits follow the channelized naming convention
        train = dataset_path(args.data_dir, args.imsize,
                             "warped_gp_ng64_n4096_train")
        test = dataset_path(args.data_dir, args.imsize,
                            "warped_gp_ng64_n512_test")
        ntrain_total, ntest_total = 4096, 512
        kle, family = 0, "warped_grf"
    else:
        raise ValueError(f"unknown data option: {args.data}")
    assert args.ntrain <= ntrain_total and args.ntest <= ntest_total
    # generate lazily at the size actually needed (inputs only for train)
    ensure_dataset(train, family, max(args.ntrain, 1), args.imsize, kle,
                   seed=10_000 + kle, with_output=need_train_output)
    ensure_dataset(test, family, max(args.ntest, 1), args.imsize, kle,
                   seed=20_000 + kle, with_output=True)
    return train, test


def uq_dataset_files(run_args, n_mc: int, ntest: int):
    """Monte-Carlo + labeled-val files for the UQ suite (post_cglow).

    Family-aware twin of ``resolve_dataset_files``; the MC design gets its
    own seed stream (40_000 + kle) so it never aliases the train/val
    designs.  ``run_args`` is a trained run's args.txt namespace — runs
    recorded before the ``--data`` flag existed default to the GRF family.
    """
    data = getattr(run_args, "data", "grf_kle512")
    if data == "grf_kle512":
        kle = getattr(run_args, "kle", None) or 512
        mc = dataset_path(run_args.data_dir, run_args.imsize,
                          f"kle{kle}_lhs10000_monte_carlo")
        test = dataset_path(run_args.data_dir, run_args.imsize,
                            f"kle{kle}_lhs1000_val")
        family = "grf"
    elif data == "channelized":
        mc = dataset_path(run_args.data_dir, run_args.imsize,
                          "channel_ng64_n10000_mc")
        test = dataset_path(run_args.data_dir, run_args.imsize,
                            "channel_ng64_n512_test")
        kle, family = 0, "channelized"
    elif data == "warped_grf":
        mc = dataset_path(run_args.data_dir, run_args.imsize,
                          "warped_gp_ng64_n10000_mc")
        test = dataset_path(run_args.data_dir, run_args.imsize,
                            "warped_gp_ng64_n512_test")
        kle, family = 0, "warped_grf"
    else:
        raise ValueError(f"unknown data option: {data}")
    ensure_dataset(mc, family, n_mc, run_args.imsize, kle,
                   seed=40_000 + kle, with_output=True)
    ensure_dataset(test, family, ntest, run_args.imsize, kle,
                   seed=20_000 + kle, with_output=True)
    return mc, test


def run_codec_training(args, loss_kind: str):
    """The epoch loop shared by both codec drivers.

    loss_kind: 'mixed_residual' (label-free physics) or 'mle' (MSE).
    """
    args.train_dir = os.path.join(args.run_dir, "training")
    args.pred_dir = os.path.join(args.train_dir, "predictions")
    os.makedirs(args.pred_dir, exist_ok=True)

    mesh = data_mesh(args.n_devices) if args.n_devices else None
    sharding = batch_sharding(mesh) if mesh else None

    dtype = jnp.bfloat16 if getattr(args, "dtype", "f32") == "bf16" else None
    model = DenseED(in_channels=1, out_channels=3, imsize=args.imsize,
                    blocks=args.blocks, growth_rate=args.growth_rate,
                    init_features=args.init_features,
                    drop_rate=args.drop_rate, out_activation=None,
                    upsample=args.upsample, dtype=dtype,
                    shared_stats=getattr(args, "shared_stats", False),
                    concat_free=getattr(args, "concat_free", False))

    train_file, test_file = resolve_dataset_files(
        args, need_train_output=(loss_kind == "mle"))
    x_train, y_train, _ = load_data(train_file, args.ntrain,
                                    only_input=(loss_kind == "mixed_residual"))
    x_test, y_test, stats = load_data(test_file, args.ntest, only_input=False,
                                      return_stats=True)
    y_variation = stats["y_variation"]
    print(f"Test output variation per channel: {y_variation}")

    train_arrays = (x_train,) if y_train is None else (x_train, y_train)
    train_ds = DeviceDataset(*train_arrays, batch_size=args.batch_size,
                             key=args.seed, sharding=sharding)
    test_ds = DeviceDataset(x_test, y_test, batch_size=args.test_batch_size,
                            key=args.seed + 1, sharding=sharding,
                            shuffle=False)

    total_steps = args.epochs * len(train_ds)
    print(f"total steps: {total_steps}")
    sample = jnp.asarray(x_train[: max(args.batch_size // 8, 1)])
    state, tx = create_state(model, jax.random.key(args.seed), sample,
                             lr_max=args.lr, total_steps=total_steps,
                             div_factor=args.lr_div, pct_start=args.lr_pct,
                             weight_decay=args.weight_decay)
    n_params, n_layers = module_size(state.params)
    print(f"# params {n_params}, # conv layers {n_layers}")

    sobel = SobelFilter(args.imsize, correct=True,
                        filter_size=getattr(args, "sobel_size", 3))
    physics = getattr(args, "physics", "sobel")
    fvcg_kw = dict(fvcg_weight=getattr(args, "fvcg_weight", 100.0),
                   fvcg_flux_weight=getattr(args, "fvcg_flux_weight", 0.0),
                   fvcg_iters=getattr(args, "fvcg_iters", None))
    if loss_kind == "mixed_residual":
        train_step = make_mixed_residual_step(model, tx, sobel,
                                              args.weight_bound,
                                              dropout_seed=args.seed,
                                              physics=physics, **fvcg_kw)
    else:
        train_step = make_mle_step(model, tx, dropout_seed=args.seed)
    eval_step = make_eval_step(model, sobel, args.weight_bound,
                               physics=physics, **fvcg_kw)

    start_epoch = 1
    restored_meta: dict = {}
    init_from = getattr(args, "init_from", None)
    if init_from and args.ckpt_epoch is None:
        # warm start: params + batch_stats only, fresh optimizer + schedule
        # (cGlow --init-from semantics).  The codec is fully convolutional,
        # so a checkpoint trained at one imsize initializes any other —
        # the coarse-to-fine lever for the 128^2 pressure wall (round 5).
        src, _, ep = init_from.partition(":")
        src_ckpt = os.path.join(src, "checkpoints")
        ep = int(ep) if ep else latest_epoch(src_ckpt)
        loaded = restore_checkpoint(src_ckpt, ep, state)
        state = state._replace(params=loaded.params,
                               batch_stats=loaded.batch_stats)
        print(f"Warm-started weights from {src_ckpt} epoch {ep}")
    if args.ckpt_epoch is not None:
        state, restored_meta = restore_checkpoint(args.ckpt_dir,
                                                  args.ckpt_epoch, state,
                                                  with_meta=True)
        start_epoch = args.ckpt_epoch + 1
        print(f"Loaded ckpt at epoch {args.ckpt_epoch}; resume "
              f"from {start_epoch} to {args.epochs}")

    if mesh:
        state = replicate(state, mesh)

    # resume continues the saved history so the stats curves and the
    # label-free checkpoint selection see pre-resume epochs too
    logger = restored_meta.get("logger") or {
        "loss_train": [], "loss_test": [], "r2_test": [],
        "nrmse_test": [], "consistency_test": []}
    ckpt_consistency: list[tuple[int, float]] = [
        tuple(t) for t in restored_meta.get("ckpt_consistency", [])]

    scan_epochs = bool(getattr(args, "scan_epochs", True))
    eval_epoch_fn = (make_eval_epoch_fn(eval_step.core, sharding)
                     if scan_epochs else None)
    # the test set never shuffles, so its batch-index tensor is a constant:
    # build it once instead of re-dispatching arange+reshape every eval
    eval_idx = test_ds.epoch_indices(0) if eval_epoch_fn is not None else None

    def test(epoch, state, record=True):
        plot_batch = None
        want_plot = (record and not args.no_plot
                     and (epoch % args.plot_freq == 0 or epoch == args.epochs))
        if eval_epoch_fn is not None and not want_plot:
            # whole test set as ONE device program + ONE host fetch (the
            # eager per-batch loop below costs ~steps_per_epoch round trips
            # over the tunnel every eval epoch)
            ms = eval_epoch_fn(state, eval_idx, *test_ds.arrays)
            fl, frel, fsse, fcons = jax.device_get(
                (ms["loss"], ms["rel_l2"], ms["sse"], ms["consistency"]))
            loss_test = float(fl.mean())
            relative_l2 = frel.reshape(-1, frel.shape[-1]).mean(0)
            r2 = np.asarray(r2_score(fsse.reshape(-1, fsse.shape[-1]).sum(0),
                                     np.asarray(y_variation)))
            consistency = float(fcons.mean())
        else:
            # eager path: plot epochs (need per-batch outputs) and
            # --no-scan-epochs; accumulate on device, ONE sync at the end
            losses, rel, sse, cons = [], [], [], []
            for x, y in test_ds.batches(epoch):
                out = eval_step(state, x, y)
                losses.append(out["loss"])
                rel.append(out["rel_l2"])
                sse.append(out["sse"])
                cons.append(out["consistency"])
                if want_plot:
                    plot_batch = (y, out["output"])  # device refs
            loss_test = float(jnp.mean(jnp.stack(losses)))
            relative_l2 = np.asarray(jnp.concatenate(rel, 0).mean(0))
            r2 = np.asarray(r2_score(jnp.concatenate(sse, 0).sum(0),
                                     jnp.asarray(y_variation)))
            consistency = float(jnp.mean(jnp.stack(cons)))
        if record and epoch % args.ckpt_freq == 0:
            ckpt_consistency.append((epoch, consistency))
        print(f"Epoch {epoch}: test r2-score: {r2}")
        print(f"Epoch {epoch}: test relative-l2: {relative_l2}")
        print(f"Epoch {epoch}: flux-pressure consistency: {consistency:.4f}")
        if want_plot and plot_batch is not None:
            n_samples = 6 if epoch == args.epochs else 2
            y_np, out_np = np.asarray(plot_batch[0]), np.asarray(plot_batch[1])
            idx = np.random.permutation(len(y_np))[:n_samples]
            for i in idx:
                plot_prediction_det(args.pred_dir, y_np[i], out_np[i], epoch,
                                    int(i), plot_fn=args.plot_fn)
        if record and epoch % args.log_freq == 0:
            logger["loss_test"].append(loss_test)
            logger["r2_test"].append(r2.tolist())
            logger["nrmse_test"].append(relative_l2.tolist())
            logger["consistency_test"].append(consistency)

    from ..utils.observability import JsonlLogger, StepTimer, profile_trace
    timer = StepTimer(args.batch_size)
    jsonl = JsonlLogger(os.path.join(args.train_dir, "metrics.jsonl"))
    profile_epoch = getattr(args, "profile_epoch", 0)

    # hot loop: each epoch is ONE device program by default.  Honest
    # (value-fetch-fenced) measurements on this axon v5e: the scanned and
    # eager step bodies both run ~6.7 ms/step, but the eager DeviceDataset
    # loop pays ~50 ms/step in per-dispatch round-trips over the tunnel —
    # the scan is ~7x faster end-to-end.  --no-scan-epochs keeps the eager
    # loop (equivalence guarded by test_codec_scan_epochs_cli).  NOTE:
    # block_until_ready is a no-op on the axon platform — only value
    # fetches (float/np.asarray) fence.
    if scan_epochs:
        epoch_fn = make_epoch_fn(train_step.core, sharding)

    print("Start training..." + "." * 47)
    tic = time.time()
    for epoch in range(start_epoch, args.epochs + 1):
        timer.start()
        with profile_trace(os.path.join(args.train_dir, "profile"),
                           enabled=(epoch == profile_epoch)):
            if scan_epochs:
                state, metrics = epoch_fn(
                    state, train_ds.epoch_indices(epoch), *train_ds.arrays)
                losses = metrics["loss"]
            else:
                step_losses = []
                for batch in train_ds.batches(epoch):
                    state, metrics = train_step(state, *batch)
                    step_losses.append(metrics["loss"])
                losses = jnp.stack(step_losses)
            timer.step(len(train_ds))
        loss_train = float(jnp.mean(losses))  # the real epoch fence
        rate = timer.result()
        print(f"Epoch {epoch}, lr {current_lr(state):.6f}, "
              f"{rate['samples_per_sec']:.0f} samples/sec")
        print(f"Epoch {epoch}: training loss: {loss_train:.6f}")
        if epoch % args.log_freq == 0:
            logger["loss_train"].append(loss_train)
            jsonl.log({"epoch": epoch, "loss_train": loss_train,
                       "lr": current_lr(state),
                       "samples_per_sec": rate["samples_per_sec"]})
        # eval BEFORE checkpointing so the meta sidecar carries this epoch's
        # logger entries and consistency record (predict_codec
        # --select-consistency reads them from the latest checkpoint) —
        # but save even if eval raises (transient TPU Internal errors,
        # CLAUDE.md) so the epoch's weights are never lost
        try:
            test(epoch, state)
        finally:
            if epoch % args.ckpt_freq == 0:
                save_checkpoint(args.ckpt_dir, epoch, state,
                                meta={"epoch": epoch, "logger": logger,
                                      "ckpt_consistency": ckpt_consistency})

    training_time = time.time() - tic
    print(f"Finished training {args.epochs} epochs with {args.ntrain} data "
          f"using {training_time / 60:.2f} mins")
    from ..train.checkpoint import select_consistency_epoch
    selected = select_consistency_epoch(ckpt_consistency)
    if selected is not None:
        # label-free checkpoint selection: long schedules can freeze u in a
        # drifted state (per-seed lottery, docs/RESULTS.md) — the
        # flux-pressure consistency metric detects it without labels
        sel_epoch, sel_cons = selected
        print(f"Label-free checkpoint selection (min flux-pressure "
              f"consistency): epoch {sel_epoch} ({sel_cons:.4f})")
        if sel_epoch != args.epochs:
            sel_state = restore_checkpoint(args.ckpt_dir, sel_epoch, state)
            print(f"Metrics at the selected checkpoint (epoch {sel_epoch}):")
            test(sel_epoch, sel_state, record=False)
    save_stats(args.train_dir, logger, "loss_train", "loss_test",
               "nrmse_test", "r2_test", "consistency_test")
    args.training_time = training_time
    args.n_params, args.n_layers = n_params, n_layers
    from ..data.hdf5 import save_args
    save_args(args.run_dir, args)
    return state, logger


def run_find_lr(args, loss_kind: str, init_value: float = 1e-8,
                final_value: float = 10.0, beta: float = 0.98):
    """LR-range test (reference: utils/practices.py:45-83), --find-lr hook.

    One epoch with exponentially increasing LR; records the smoothed loss
    per log10(lr), stops when it exceeds 4x the best.  Writes
    ``find_lr.txt`` (log_lr, smoothed_loss columns) and ``find_lr.pdf``
    into the run dir and returns (log_lrs, losses).
    """
    from ..train.schedules import find_lr_schedule

    model = DenseED(in_channels=1, out_channels=3, imsize=args.imsize,
                    blocks=args.blocks, growth_rate=args.growth_rate,
                    init_features=args.init_features,
                    drop_rate=args.drop_rate, out_activation=None,
                    upsample=args.upsample)
    train_file, _ = resolve_dataset_files(
        args, need_train_output=(loss_kind == "mle"))
    x_train, y_train, _ = load_data(train_file, args.ntrain,
                                    only_input=(loss_kind == "mixed_residual"))
    arrays = (x_train,) if y_train is None else (x_train, y_train)
    train_ds = DeviceDataset(*arrays, batch_size=args.batch_size,
                             key=args.seed)

    num = max(len(train_ds) - 1, 1)
    schedule = find_lr_schedule(init_value, final_value, num)
    sample = jnp.asarray(x_train[: max(args.batch_size // 8, 1)])
    state, tx = create_state(model, jax.random.key(args.seed), sample,
                             lr_max=args.lr, total_steps=num,
                             schedule=schedule,
                             weight_decay=args.weight_decay)
    sobel = SobelFilter(args.imsize, correct=True,
                        filter_size=getattr(args, "sobel_size", 3))
    if loss_kind == "mixed_residual":
        step = make_mixed_residual_step(model, tx, sobel, args.weight_bound,
                                        dropout_seed=args.seed)
    else:
        step = make_mle_step(model, tx, dropout_seed=args.seed)

    mult = (final_value / init_value) ** (1.0 / num)
    avg_loss, best_loss = 0.0, 0.0
    log_lrs, losses = [], []
    # fetch losses in chunks of 8 steps (per-step float() syncs cost ~30 ms
    # RTT each over the tunnel — CLAUDE.md rule); the divergence stop then
    # acts at chunk granularity, which only trims the plot's tail
    CHUNK = 8
    pending: list[tuple[int, float, object]] = []
    stop = False

    def flush():
        nonlocal avg_loss, best_loss, stop
        vals = np.asarray(jnp.stack([m for _, _, m in pending]))
        for (bnum, lr, _), val in zip(pending, vals):
            avg_loss = beta * avg_loss + (1 - beta) * float(val)
            smoothed = avg_loss / (1 - beta ** bnum)
            if bnum > 1 and smoothed > 4 * best_loss:
                print(f"[find_lr] diverged at lr {lr:.3e} (step {bnum})")
                stop = True
                break
            if smoothed < best_loss or bnum == 1:
                best_loss = smoothed
            log_lrs.append(np.log10(lr))
            losses.append(smoothed)
        pending.clear()

    for batch_num, batch in enumerate(train_ds.batches(1), start=1):
        lr = init_value * mult ** (batch_num - 1)
        state, metrics = step(state, *batch)
        pending.append((batch_num, lr, metrics["loss"]))
        if len(pending) >= CHUNK:
            flush()
            if stop:
                break
    if pending and not stop:
        flush()
    print(f"[find_lr] best smoothed loss {best_loss:.4f}; "
          f"suggested lr ~ 10^{log_lrs[int(np.argmin(losses))]:.2f} / 10")

    out = np.stack([log_lrs, losses], axis=1)
    np.savetxt(os.path.join(args.run_dir, "find_lr.txt"), out,
               header="log10_lr smoothed_loss")
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    sl = slice(10, -5) if len(log_lrs) > 20 else slice(None)
    plt.figure()
    plt.plot(np.asarray(log_lrs)[sl], np.asarray(losses)[sl])
    plt.xlabel("log10(lr)")
    plt.ylabel("smoothed loss")
    plt.savefig(os.path.join(args.run_dir, "find_lr.pdf"))
    plt.close()
    return log_lrs, losses
