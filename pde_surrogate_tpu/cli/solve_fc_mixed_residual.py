"""Solve ONE Darcy instance with an FC net (PINN-style) + L-BFGS.

Reference: solve_fc_mixed_residual.py — a CPPN maps (y, x) coordinates to
(u, tau_ver, tau_hor); the loss is the autograd mixed residual at
collocation points plus Dirichlet/Neumann penalties.  Derivatives come from
nested jax transforms (vmapped jacfwd) instead of ``create_graph=True``
double backward.

Channel-order quirk preserved: the net's channels 1/2 are (flux_ver,
flux_hor), reordered at test time to the dataset's (flux_hor, flux_ver)
(solve_fc_mixed_residual.py:170-174).

Run:  python -m pde_surrogate_tpu.cli.solve_fc_mixed_residual \
          --data grf --kle 512 --idx 8
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.hdf5 import load_data
from ..models.cppn import CPPN, fc_model_size
from ..ops.darcy import mixed_residual_fc, neumann_boundary_mixed
from ..ops.sampling import SampleSpatial2d
from ..train.checkpoint import save_checkpoint
from ..train.lbfgs import lbfgs_optimizer, make_lbfgs_epoch, run_adam_warmup
from ..utils.config import (BaseParser, enable_compilation_cache,
                            seed_everything)
from ..viz.plot import (plot_prediction_det, plot_prediction_det_animate,
                        plot_row, save_stats)
from .solve_conv_mixed_residual import ensure_test_dataset


class Parser(BaseParser):
    def __init__(self):
        super().__init__(description="FC nets to solve PDE")
        self.add_argument("--exp-dir", type=str, default="./experiments/solver")
        self.add_argument("--data-dir", type=str, default="./datasets")
        self.add_argument("--data", type=str, default="grf",
                          choices=["grf", "channelized", "warped_grf"])
        self.add_argument("--kle", type=int, default=512)
        self.add_argument("--imsize", type=int, default=64)
        self.add_argument("--idx", type=int, default=8)
        self.add_argument("--alpha1", type=float, default=1.0)
        self.add_argument("--alpha2", type=float, default=1.0)
        self.add_argument("--dim-hidden", type=int, default=512)
        self.add_argument("--layers-hidden", type=int, default=8)
        self.add_argument("--off-grid", action="store_true")
        self.add_argument("--n-colloc", type=int, default=4096)
        self.add_argument("--weight-bound", type=float, default=10.0)
        self.add_argument("--lr", type=float, default=0.5)
        self.add_argument("--epochs", type=int, default=2000)
        self.add_argument("--test-freq", type=int, default=50)
        self.add_argument("--ckpt-freq", type=int, default=250)
        self.add_argument("--cmap", type=str, default="jet")
        self.add_argument("--same-scale", action="store_true")
        self.add_argument("--animate", action="store_true")
        self.add_argument("--seed", type=int, default=1)
        self.add_argument("-v", "--verbose", action="store_true")
        self.add_argument("--no-plot", action="store_true", default=False)
        self.add_argument("--linesearch", type=str, default="zoom",
                          choices=["zoom", "fixed"],
                          help="zoom: Wolfe linesearch (stable for the deep "
                               "FC net); fixed: torch-style lr steps")
        self.add_argument("--adam-warmup", type=int, default=4000,
                          help="Adam steps before L-BFGS (the classic PINN "
                               "recipe; L-BFGS alone stalls in a flat basin "
                               "of the deep tanh net). 0 disables.")
        self.add_argument("--adam-lr", type=float, default=2e-3)


def main(argv=None):
    args = Parser().parse_args(argv)
    enable_compilation_cache()
    seed_everything(args.seed)
    dataset = (f"{args.data}_kle{args.kle}" if args.data == "grf"
               else args.data)
    hyparams = (f"{dataset}_idx{args.idx}_dhid{args.dim_hidden}_"
                f"lhid{args.layers_hidden}_alpha1_{args.alpha1}_"
                f"alpha2_{args.alpha2}_lr{args.lr}_wb{args.weight_bound}_"
                f"epochs{args.epochs}_ongrid_{not args.off_grid}_"
                f"ncolloc{args.n_colloc}")
    run_dir = os.path.join(args.exp_dir, "fc_mixed_residual", hyparams)
    os.makedirs(run_dir, exist_ok=True)

    hdf5_file = ensure_test_dataset(args)
    x_all, y_all, _ = load_data(hdf5_file, args.idx + 1, only_input=False)
    perm_grid = x_all[args.idx, :, :, 0]            # (H, W)
    target = np.moveaxis(y_all[args.idx], -1, 0)    # (3, H, W): u, fh, fv

    model = CPPN(dim_in=2, dim_out=3, dim_hidden=args.dim_hidden,
                 layers_hidden=args.layers_hidden)
    params = model.init(jax.random.key(args.seed), jnp.zeros((1, 2)))["params"]
    print(fc_model_size(params))

    def model_fn(params, pts):
        return model.apply({"params": params}, pts)

    sampler = SampleSpatial2d(args.imsize, args.imsize, rng=args.seed)
    on_grid = not args.off_grid
    x_colloc = jnp.asarray(sampler.colloc(on_grid, n_samples=args.n_colloc))
    x_dirichlet = jnp.asarray(np.concatenate(
        [sampler.left(on_grid=False, n_samples=256),
         sampler.right(on_grid=False, n_samples=256)], 0))
    y_dirichlet = jnp.concatenate(
        [jnp.ones((256, 1)), jnp.zeros((256, 1))], 0)
    x_neumann = jnp.asarray(np.concatenate(
        [sampler.top(on_grid), sampler.bottom(on_grid)], 0))

    if on_grid:
        # gather K at the sampled grid points so any --n-colloc subset stays
        # point-aligned (the reference pairs a PERMUTED point subset with the
        # row-major K grid when n_colloc < imsize^2 — a known bug; for the
        # default full grid this reduces to row-major order bitwise)
        pts = np.asarray(x_colloc)
        iy = np.rint(pts[:, 0] * (args.imsize - 1)).astype(int)
        ix = np.rint(pts[:, 1] * (args.imsize - 1)).astype(int)
        K_colloc = jnp.asarray(perm_grid[iy, ix].reshape(-1, 1))
    else:
        K_colloc = jnp.asarray(perm_grid.reshape(-1, 1))  # interp inside loss

    def loss_fn(params):
        loss_colloc = mixed_residual_fc(model_fn, params, x_colloc, K_colloc,
                                        rand_colloc=args.off_grid,
                                        imsize=args.imsize)
        loss_diri = jnp.mean(
            (model_fn(params, x_dirichlet)[:, 0:1] - y_dirichlet) ** 2)
        loss_neum = neumann_boundary_mixed(model_fn, params, x_neumann)
        return loss_colloc + args.weight_bound * (loss_diri + loss_neum)

    if args.adam_warmup > 0:
        params, warm_loss = run_adam_warmup(loss_fn, params, args.adam_warmup,
                                            args.adam_lr)
        print(f"Adam warmup ({args.adam_warmup} steps): loss {warm_loss:.6f}")

    fixed = args.linesearch == "fixed"
    opt = lbfgs_optimizer(memory_size=50,
                          learning_rate=args.lr if fixed else None)
    opt_state = opt.init(params)
    epoch_fn = make_lbfgs_epoch(loss_fn, opt, iters_per_epoch=20,
                                with_linesearch=not fixed)

    # full-grid prediction points, (y, x) ordering
    yy, xx = np.meshgrid(np.arange(args.imsize), np.arange(args.imsize),
                         indexing="ij")
    xy_test = jnp.asarray(np.stack(
        [yy.ravel() / (args.imsize - 1), xx.ravel() / (args.imsize - 1)],
        1).astype(np.float32))

    @jax.jit
    def predict(params):
        return model_fn(params, xy_test)

    def test(epoch, params):
        if epoch % args.epochs == 0 or epoch % args.test_freq == 0:
            y_pred = np.asarray(predict(params))
            n = args.imsize
            u = y_pred[:, 0].reshape(n, n)
            flux_ver = y_pred[:, 1].reshape(n, n)
            flux_hor = y_pred[:, 2].reshape(n, n)
            prediction = np.stack([u, flux_hor, flux_ver])  # dataset order
            if not args.no_plot:
                if args.animate:
                    plot_prediction_det_animate(
                        run_dir, target, prediction, epoch, args.idx,
                        epoch // args.test_freq, cmap=args.cmap,
                        same_scale=args.same_scale)
                else:
                    plot_prediction_det(run_dir, target, prediction, epoch,
                                        args.idx, cmap=args.cmap,
                                        same_scale=args.same_scale)
            np.save(os.path.join(run_dir, f"epoch{epoch}.npy"), prediction)
            rel = np.sqrt(((prediction - target) ** 2).sum((1, 2))
                          / (target ** 2).sum((1, 2)))
            print(f"epoch {epoch}: relative l2 {rel}")

    logger = {"loss": []}
    print("start training...")
    tic = time.time()
    for epoch in range(1, args.epochs + 1):
        params, opt_state, loss = epoch_fn(params, opt_state)
        logger["loss"].append(float(loss))
        print(f"epoch {epoch}: loss {float(loss):.10f}")
        if epoch % args.ckpt_freq == 0:
            save_checkpoint(run_dir, epoch, params)
        test(epoch, params)
    print(f"Finished training {args.epochs} epochs in "
          f"{(time.time() - tic) / 60:.3f} minutes")
    save_stats(run_dir, logger, "loss")
    if args.animate and not args.no_plot:
        from ..viz.plot import assemble_gif
        gif = assemble_gif(run_dir)
        if gif:
            print(f"animation: {gif}")

    if not args.no_plot:
        # super-resolution render (solve_fc_mixed_residual.py:202-213)
        n_hr = 640
        yy, xx = np.meshgrid(np.arange(n_hr), np.arange(n_hr), indexing="ij")
        pts = jnp.asarray(np.stack([yy.ravel() / (n_hr - 1),
                                    xx.ravel() / (n_hr - 1)], 1)
                          .astype(np.float32))
        u_hr = np.asarray(model_fn(params, pts))[:, 0].reshape(n_hr, n_hr)
        plot_row([u_hr], run_dir, "solution_HR", plot_fn="contourf")
        plot_row([np.log(perm_grid)], run_dir, "input_logK")
    return params, logger, target


if __name__ == "__main__":
    main()
