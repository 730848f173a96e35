"""BC-anchored post-correction probe.

Campaign M showed the canonical run's u failure mode is a near-constant
interior offset (u rel-L2 <= 0.05 at R^2 -3.8).  The Dirichlet boundary
values are KNOWN (u=1 left column, u=0 right column) — so the offset is
observable without labels: estimate it per sample from the mean edge error
and subtract.  If the drift really is constant, this repairs u for free.

Usage: python tools/bc_correct_probe.py <run_dir> <epoch> [ntest]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pde_surrogate_tpu.data.hdf5 import dataset_path, load_data  # noqa: E402
from pde_surrogate_tpu.models.codec import DenseED  # noqa: E402
from pde_surrogate_tpu.train.checkpoint import restore_checkpoint  # noqa: E402
from pde_surrogate_tpu.train.codec_trainer import create_state  # noqa: E402


def metrics(pred, y):
    """(rel_l2, r2) per channel, reference definitions."""
    rel = np.sqrt(((pred - y) ** 2).sum((1, 2)) / (y ** 2).sum((1, 2))).mean(0)
    sse = ((pred - y) ** 2).sum((0, 1, 2))
    var = ((y - y.mean(0, keepdims=True)) ** 2).sum((0, 1, 2))
    return rel, 1.0 - sse / var


def main():
    run_dir, epoch = sys.argv[1], int(sys.argv[2])
    ntest = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    imsize = 64
    model = DenseED(1, 3, imsize=imsize, blocks=[6, 8, 6], growth_rate=16,
                    init_features=48)
    # load_data returns NHWC
    x, y, _ = load_data(dataset_path("./datasets", imsize, "kle512_lhs1000_val"),
                        ntest, only_input=False)

    state, _ = create_state(model, jax.random.key(0),
                            jnp.asarray(x[:1]), lr_max=1e-3, total_steps=10)
    state = restore_checkpoint(f"{run_dir}/checkpoints", epoch, state)

    @jax.jit
    def forward(params, batch_stats, xb):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           xb, train=False)

    preds = []
    for i in range(0, ntest, 16):
        preds.append(np.asarray(forward(state.params, state.batch_stats,
                                        jnp.asarray(x[i:i + 16]))))
    pred = np.concatenate(preds, 0)

    rel, r2 = metrics(pred, y)
    print(f"raw:          rel-L2 {rel}  R2 {r2}")

    # label-free constant-offset estimate from the known Dirichlet edges
    u = pred[..., 0]
    off = 0.5 * ((u[:, :, 0] - 1.0).mean(1) + u[:, :, -1].mean(1))
    pred_c = pred.copy()
    pred_c[..., 0] = u - off[:, None, None]
    rel_c, r2_c = metrics(pred_c, y)
    print(f"bc-corrected: rel-L2 {rel_c}  R2 {r2_c}")
    print(f"offset stats: mean {off.mean():.4f}  std {off.std():.4f}  "
          f"max|.| {np.abs(off).max():.4f}")

    # flux-integrated reconstruction: sigma_1 = -K du/dx, u(0)=1  =>
    # u(x) = 1 - int_0^x sigma1_hat / K.  Uses only the predicted flux, the
    # input K, and the known BC — fully label-free.  Trapezoid along x;
    # average with the mirrored integral from the right edge (u(1)=0) to
    # cancel accumulated drift.
    K = x[..., 0]
    dudx = -pred[..., 1] / K
    dx = 1.0 / (imsize - 1)
    mids = 0.5 * (dudx[:, :, 1:] + dudx[:, :, :-1]) * dx
    cum = np.concatenate([np.zeros_like(mids[:, :, :1]),
                          np.cumsum(mids, axis=2)], axis=2)
    u_left = 1.0 + cum                       # integrate from u(x=0)=1
    u_right = (cum - cum[:, :, -1:])         # integrate back from u(x=1)=0
    w = np.linspace(0.0, 1.0, imsize)[None, None, :]
    u_rec = (1 - w) * u_left + w * u_right   # blend: trust the nearer anchor
    pred_f = pred.copy()
    pred_f[..., 0] = u_rec
    rel_f, r2_f = metrics(pred_f, y)
    print(f"flux-integrated: rel-L2 {rel_f}  R2 {r2_f}")


if __name__ == "__main__":
    main()
