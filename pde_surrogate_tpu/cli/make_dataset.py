"""Dataset factory: generate the reference's dataset families locally.

Replaces scripts/download_datasets.sh: instead of downloading FEniCS-solved
HDF5 archives, inputs are sampled (GRF-KLE via LHS designs, warped GRF,
channelized) and labels are solved on device with the batched finite-volume
Darcy solver — thousands of PDE solves per vmap.

Files are written in the reference's exact naming/layout
(README.md:22-34), e.g.::

    datasets/64x64/kle512_lhs10000_train.hdf5      (input only)
    datasets/64x64/kle512_lhs1000_val.hdf5         (input + output)
    datasets/64x64/kle512_lhs1000_test.hdf5
    datasets/64x64/kle512_lhs10000_monte_carlo.hdf5
    datasets/64x64/channel_ng64_n4096_train.hdf5
    datasets/64x64/warped_gp_ng64_n1000.hdf5

Run:  python -m pde_surrogate_tpu.cli.make_dataset --imsize 64 --kle 512
"""

from __future__ import annotations

import argparse
import os
import time

import jax.numpy as jnp
import numpy as np

from ..data.grf import sample_channelized, sample_kle, sample_warped_grf
from ..data.hdf5 import dataset_path, save_dataset
from ..solvers.fd_darcy import solve_darcy_batch_fast


def _solve_labels(k: np.ndarray, solve_batch: int) -> np.ndarray:
    outs = []
    tic = time.time()
    for i in range(0, len(k), solve_batch):
        outs.append(np.asarray(solve_darcy_batch_fast(jnp.asarray(k[i:i + solve_batch]))))
        done = min(i + solve_batch, len(k))
        rate = done / max(time.time() - tic, 1e-9)
        print(f"  solved {done}/{len(k)} ({rate:.1f} fields/sec)")
    return np.concatenate(outs, 0)


def main(argv=None):
    p = argparse.ArgumentParser(description="Generate Darcy datasets")
    p.add_argument("--data-dir", type=str, default="./datasets")
    p.add_argument("--imsize", type=int, default=64)
    p.add_argument("--family", type=str, default="grf",
                   choices=["grf", "warped_grf", "channelized"])
    p.add_argument("--kle", type=int, default=512)
    p.add_argument("--length-scale", type=float, default=0.25)
    p.add_argument("--ntrain", type=int, default=10000)
    p.add_argument("--nval", type=int, default=1000)
    p.add_argument("--ntest", type=int, default=1000)
    p.add_argument("--n-monte-carlo", type=int, default=10000)
    p.add_argument("--solve-batch", type=int, default=64)
    p.add_argument("--train-labels", action="store_true", default=False,
                   help="also solve labels for the training split (needed "
                        "for MLE training / data-init)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    # the solver executables recompile per process otherwise (20-200 s
    # remote compiles over the tunnel)
    from ..utils.config import enable_compilation_cache
    enable_compilation_cache()

    n = args.imsize
    if args.family == "grf":
        k = args.kle
        splits = [
            (f"kle{k}_lhs{args.ntrain}_train", args.ntrain,
             10_000 + k, args.train_labels),
            (f"kle{k}_lhs{args.nval}_val", args.nval, 20_000 + k, True),
            (f"kle{k}_lhs{args.ntest}_test", args.ntest, 32_000 + k, True),
            (f"kle{k}_lhs{args.n_monte_carlo}_monte_carlo",
             args.n_monte_carlo, 40_000 + k, True),
        ]
        gen = lambda m, seed: sample_kle(m, n, k, args.length_scale, rng=seed)
    elif args.family == "channelized":
        # same seeds as the lazy paths (_codec_common.resolve_dataset_files
        # / solve_conv.ensure_test_dataset: 10_000/20_000 + kle with kle=0)
        # so both generators produce identical bytes for the same filenames
        splits = [(f"channel_ng{n}_n{args.ntrain}_train", args.ntrain,
                   10_000, args.train_labels),
                  (f"channel_ng{n}_n{args.ntest}_test", args.ntest,
                   20_000, True)]
        gen = lambda m, seed: sample_channelized(m, n, rng=seed)
    else:
        splits = [(f"warped_gp_ng{n}_n{args.ntest}", args.ntest, 30_000, True)]
        gen = lambda m, seed: sample_warped_grf(m, n, rng=seed)

    for name, count, seed, with_labels in splits:
        path = dataset_path(args.data_dir, n, name)
        if os.path.isfile(path):
            print(f"[skip] {path} exists")
            continue
        print(f"[gen] {path}: {count} samples...")
        k_fields = gen(count, seed + args.seed)
        y = _solve_labels(k_fields, args.solve_batch) if with_labels else None
        save_dataset(path, k_fields[:, None], y)
        print(f"[gen] wrote {path}")


if __name__ == "__main__":
    main()
