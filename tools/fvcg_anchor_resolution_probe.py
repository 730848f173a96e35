"""How deep must the fvcg anchor's CG run at 128^2? (round-4 probe)

Context: pure fvcg at kle512@128 with the grid default n_cg = n = 128
landed u R^2 0.873 with consistency 0.046 (clean band) — the hypothesis
in docs/RESULTS.md is that u is bounded by the ANCHOR's own resolution
(e_k at depth n is an estimate, not a solve; kappa ~ n^2 so
depth-proportional-to-n halves the relative Krylov resolution per size
doubling), not by drift or schedule.

This probe measures that directly on the trained run-69 checkpoint, on
CPU, without burning a TPU leg: for each n_cg it evaluates the anchor's
own targets against the solver labels —

  * rel-L2 of the corrected pressure  u_hat + e_k  vs u*
  * rel-L2 of the anchor's flux target  flux(u_hat + e_k)  vs sigma*

If the target error at n_cg=256 drops well below the current model
error (u 0.058 rel), campaign r4m's cg256 legs have headroom to close
the 0.95 u-gate; if it plateaus, the anchor needs a better solver
(multigrid / deflation), not more depth.

Run:  python tools/fvcg_anchor_resolution_probe.py [--nsamples 8]
"""

import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default=(
        "experiments/codec/mixed_residual/"
        "grf_kle512_ntrain4096_run69_bs32_lr0.001_epochs300_im128_fvcg"))
    ap.add_argument("--data", default="datasets/128x128/kle512_lhs1000_val.hdf5")
    ap.add_argument("--nsamples", type=int, default=8)
    ap.add_argument("--depths", type=int, nargs="+",
                    default=[64, 128, 256, 512, 1024])
    args = ap.parse_args()

    from pde_surrogate_tpu.data.hdf5 import load_args, load_data
    from pde_surrogate_tpu.models.codec import DenseED
    from pde_surrogate_tpu.ops.darcy import _cg_pressure_errors
    from pde_surrogate_tpu.solvers.fd_darcy import (_faces_to_nodes, _harm,
                                                    _interior_mask)
    from pde_surrogate_tpu.train.checkpoint import (latest_epoch,
                                                    restore_checkpoint)
    from pde_surrogate_tpu.train.codec_trainer import create_state

    run_args = load_args(args.run_dir)
    x, y, _ = load_data(args.data, args.nsamples, only_input=False)
    x = jnp.asarray(x)                       # (B, n, n, 1)
    y = np.asarray(y)                        # (B, n, n, 3) labels

    model = DenseED(in_channels=1, out_channels=3, imsize=run_args.imsize,
                    blocks=run_args.blocks, growth_rate=run_args.growth_rate,
                    init_features=run_args.init_features,
                    drop_rate=run_args.drop_rate, out_activation=None,
                    upsample=run_args.upsample)
    ckpt_dir = os.path.join(args.run_dir, "checkpoints")
    epoch = latest_epoch(ckpt_dir)
    state, _ = create_state(model, jax.random.key(0), x[:1], lr_max=1e-3,
                            total_steps=1,
                            weight_decay=getattr(run_args, "weight_decay",
                                                 0.0))
    state = restore_checkpoint(ckpt_dir, epoch, state)
    print(f"restored {ckpt_dir} epoch {epoch}")

    pred = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False))
    out = jnp.asarray(pred)

    def rel(a, b):
        return float(np.mean(
            np.linalg.norm((a - b).reshape(a.shape[0], -1), axis=1)
            / np.linalg.norm(b.reshape(b.shape[0], -1), axis=1)))

    u_true = y[..., 0]
    s_true = y[..., 1:]
    print(f"model u rel-L2 {rel(pred[..., 0], u_true):.4f}  "
          f"flux rel-L2 {rel(pred[..., 1:], s_true):.4f}   (the training "
          f"floor the anchor must beat)")

    K = x[..., 0]
    n = K.shape[-1]
    h = 1.0 / (n - 1)
    mask = _interior_mask(n)
    u_d = jnp.zeros((n, n), K.dtype).at[:, 0].set(1.0)
    Kx = _harm(K[..., :, :-1], K[..., :, 1:])
    Ky = _harm(K[..., :-1, :], K[..., 1:, :])

    for n_cg in args.depths:
        e = _cg_pressure_errors(x, out, n_cg)
        u_corr = (out[..., 0] + e) * mask + u_d
        fx = -Kx * (u_corr[..., :, 1:] - u_corr[..., :, :-1]) / h
        fy = -Ky * (u_corr[..., 1:, :] - u_corr[..., :-1, :]) / h
        s1, s2 = _faces_to_nodes(fx, fy)
        tgt_flux = np.stack([np.asarray(s1), np.asarray(s2)], axis=-1)
        print(f"n_cg {n_cg:5d}: anchor-target rel-L2  "
              f"u {rel(np.asarray(u_corr), u_true):.5f}  "
              f"flux {rel(tgt_flux, s_true):.5f}")


if __name__ == "__main__":
    main()
