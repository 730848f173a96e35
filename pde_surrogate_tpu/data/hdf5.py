"""HDF5 dataset IO, format-compatible with the reference datasets.

File layout (utils/load.py:18-37): datasets ``input`` (N, 1, H, W) and
``output`` (N, 3, H, W) float32, under ``datasets/{imsize}x{imsize}/`` with
names like ``kle512_lhs10000_train.hdf5`` (README.md:22-34).  Arrays are
stored NCHW on disk for drop-in compatibility and converted to the
framework's NHWC layout on load.

``load_data`` also computes the per-channel output variation
sum((y - mean(y))^2) used as the R^2 denominator (utils/load.py:28-30).
"""

from __future__ import annotations

import json
import os
from argparse import Namespace

import h5py
import numpy as np

__all__ = ["load_data", "save_dataset", "dataset_path", "load_args",
           "save_args"]


def dataset_path(data_dir: str, imsize: int, name: str) -> str:
    """Reference dataset naming: ``{data_dir}/{imsize}x{imsize}/{name}.hdf5``."""
    return os.path.join(data_dir, f"{imsize}x{imsize}", f"{name}.hdf5")


def save_dataset(path: str, x: np.ndarray, y: np.ndarray | None = None):
    """Write ``input`` (N,1,H,W) / ``output`` (N,3,H,W) in reference layout.

    Accepts NHWC or NCHW inputs; stores NCHW float32.
    """
    def to_nchw(a, channels):
        a = np.asarray(a, dtype=np.float32)
        if a.ndim == 3:
            a = a[:, None, :, :]
        elif a.shape[-1] == channels and a.shape[1] != channels:
            a = np.moveaxis(a, -1, 1)
        return a

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("input", data=to_nchw(x, 1), compression="gzip")
        if y is not None:
            f.create_dataset("output", data=to_nchw(y, 3), compression="gzip")


def load_data(hdf5_file: str, ndata: int, only_input: bool = True,
              return_stats: bool = False):
    """Load the first ``ndata`` samples as NHWC float32 arrays.

    Returns ``(x, y, stats)``; ``y`` is None when ``only_input``; ``stats``
    contains ``y_variation`` (per-channel sum of squared deviations, the R^2
    denominator, utils/load.py:28-30) when ``return_stats``.
    """
    with h5py.File(hdf5_file, "r") as f:
        x = f["input"][:ndata].astype(np.float32)
        y = None
        if not only_input:
            y = f["output"][:ndata].astype(np.float32)
    stats = {}
    if return_stats and y is not None:
        stats["y_variation"] = (
            (y - y.mean(0, keepdims=True)) ** 2).sum(axis=(0, 2, 3))
    x = np.moveaxis(x, 1, -1)
    if y is not None:
        y = np.moveaxis(y, 1, -1)
    return x, y, stats


def load_args(run_dir: str) -> Namespace:
    """Re-read a run's persisted config (utils/load.py:11-15)."""
    with open(os.path.join(run_dir, "args.txt")) as f:
        return Namespace(**json.load(f))


def save_args(run_dir: str, args) -> None:
    """Persist config as args.txt JSON (train_codec_mixed_residual.py:95-96)."""
    os.makedirs(run_dir, exist_ok=True)
    d = vars(args) if isinstance(args, Namespace) else dict(args)
    clean = {}
    for k, v in d.items():
        try:
            json.dumps(v)
            clean[k] = v
        except TypeError:
            clean[k] = str(v)
    with open(os.path.join(run_dir, "args.txt"), "w") as f:
        json.dump(clean, f, indent=4)
