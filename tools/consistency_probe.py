"""Label-free checkpoint selection probe.

For every saved checkpoint of a codec run, compute
  * the flux->pressure consistency score: rel-L2 between the net's u and
    the u reconstructed by integrating sigma1_hat/K from the Dirichlet
    edges (no labels involved), and
  * the TRUE u rel-L2 / R^2 against the solver labels.
If the consistency score tracks the true u quality, the canonical
schedule's per-seed u landing lottery is detectable — and repairable by
checkpoint selection — without any labeled data.

Usage: python tools/consistency_probe.py <run_dir> [ntest]
"""

import os
import re
import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pde_surrogate_tpu.data.hdf5 import dataset_path, load_data  # noqa: E402
from pde_surrogate_tpu.models.codec import DenseED  # noqa: E402
from pde_surrogate_tpu.ops.darcy import reconstruct_pressure  # noqa: E402
from pde_surrogate_tpu.train.checkpoint import restore_checkpoint  # noqa: E402
from pde_surrogate_tpu.train.codec_trainer import create_state  # noqa: E402


def main():
    run_dir = sys.argv[1]
    ntest = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    epochs = sorted(int(m.group(1)) for f in os.listdir(ckpt_dir)
                    if (m := re.match(r"model_epoch(\d+)\.msgpack$", f)))

    # model/data config from the run's persisted args.txt when present
    # (falls back to the canonical kle512@64 config)
    try:
        from pde_surrogate_tpu.data.hdf5 import load_args
        a = load_args(run_dir)
        imsize, blocks = a.imsize, a.blocks
        growth, init_feats = a.growth_rate, a.init_features
        val = ("channel_ng64_n512_test" if a.data == "channelized"
               else f"kle{getattr(a, 'kle', 512)}_lhs1000_val")
    except FileNotFoundError:
        imsize, blocks, growth, init_feats = 64, [6, 8, 6], 16, 48
        val = "kle512_lhs1000_val"
    model = DenseED(1, 3, imsize=imsize, blocks=blocks, growth_rate=growth,
                    init_features=init_feats)
    x, y, _ = load_data(dataset_path("./datasets", imsize, val),
                        ntest, only_input=False)
    u_true = y[..., 0]
    var_u = ((u_true - u_true.mean(0, keepdims=True)) ** 2).sum()

    template, _ = create_state(model, jax.random.key(0), jnp.asarray(x[:1]),
                               lr_max=1e-3, total_steps=10)

    @jax.jit
    def forward(params, batch_stats, xb):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           xb, train=False)

    print(f"{'epoch':>6} {'consistency':>12} {'true u relL2':>13} "
          f"{'true u R2':>10}")
    best = None
    for ep in epochs:
        state = restore_checkpoint(ckpt_dir, ep, template)
        preds = []
        for i in range(0, ntest, 16):
            preds.append(np.asarray(forward(state.params, state.batch_stats,
                                            jnp.asarray(x[i:i + 16]))))
        pred = np.concatenate(preds, 0)
        u_hat = pred[..., 0]
        u_rec = np.asarray(reconstruct_pressure(jnp.asarray(x),
                                                jnp.asarray(pred)))
        cons = float(np.sqrt(((u_hat - u_rec) ** 2).sum()
                             / (u_rec ** 2).sum()))
        rel = float(np.sqrt(((u_hat - u_true) ** 2).sum((1, 2))
                            / (u_true ** 2).sum((1, 2))).mean())
        r2 = float(1.0 - ((u_hat - u_true) ** 2).sum() / var_u)
        print(f"{ep:>6} {cons:>12.4f} {rel:>13.4f} {r2:>10.3f}")
        if best is None or cons < best[1]:
            best = (ep, cons, rel, r2)
    print(f"selected by consistency: epoch {best[0]} "
          f"(true u rel-L2 {best[2]:.4f}, R2 {best[3]:.3f})")


if __name__ == "__main__":
    main()
