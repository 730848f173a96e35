"""Driver configuration: argparse parsers with reference-compatible run dirs.

Each driver has a Parser that reproduces the reference's hyperparameters,
defaults, and ``run_dir`` naming (train_codec_mixed_residual.py:37-98 etc.),
with one deliberate fix: list-valued flags (``--blocks`` etc.) use
comma-separated integers — the reference's ``type=list`` cannot actually
parse CLI values (SURVEY.md section 5, config system).

Configs round-trip through ``args.txt`` JSON in the run dir for resume and
post-processing (utils/load.py:11-15).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

__all__ = ["int_list", "BaseParser", "seed_everything"]


def int_list(s):
    """'6,8,6' or '[6,8,6]' -> [6, 8, 6]."""
    if isinstance(s, (list, tuple)):
        return list(s)
    s = s.strip().strip("[]")
    return [int(tok) for tok in s.replace(" ", "").split(",") if tok]


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache for the drivers.

    Compiles through the remote TPU tunnel cost 20-200 s per executable;
    caching serialized executables makes re-runs of the same config start in
    seconds.  No-op if the backend doesn't support serialization.
    """
    import jax

    path = path or os.path.expanduser("~/.cache/pde_surrogate_tpu/xla")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass


def seed_everything(seed: int | None) -> int:
    """Seed host RNGs; device randomness is explicit-key (jax.random)."""
    if seed is None:
        seed = random.randint(1, 10000)
    random.seed(seed)
    import numpy as np
    np.random.seed(seed % (2 ** 32))
    return seed


class BaseParser(argparse.ArgumentParser):
    """Shared experiment-management plumbing for all drivers."""

    def add_logging_args(self, ckpt_freq=100, log_freq=1, plot_freq=50):
        self.add_argument("--debug", action="store_true", default=False)
        self.add_argument("--ckpt-epoch", type=int, default=None,
                          help="epoch of checkpoint to load")
        self.add_argument("--ckpt-freq", type=int, default=ckpt_freq)
        self.add_argument("--log-freq", type=int, default=log_freq)
        self.add_argument("--plot-freq", type=int, default=plot_freq)
        self.add_argument("--plot-fn", type=str, default="imshow",
                          choices=["contourf", "imshow"])
        self.add_argument("--no-plot", action="store_true", default=False,
                          help="skip figure generation (pure training)")
        self.add_argument("--profile-epoch", type=int, default=0,
                          help="capture a jax.profiler trace of this epoch "
                               "(0: off)")

    def finalize(self, args, hparams: str):
        """Create run/ckpt dirs, seed, persist args.txt."""
        # Redirected stdout is block-buffered: epoch prints can sit ~8 KB
        # (tens of epochs / many minutes) before reaching the log, which
        # reads as a hang and starves log-staleness watchdogs
        # (tools/hang_watchdog.sh). Epoch cadence IS our liveness signal —
        # make it line-buffered.
        try:
            sys.stdout.reconfigure(line_buffering=True)
            sys.stderr.reconfigure(line_buffering=True)
        except (AttributeError, ValueError):
            pass  # non-reconfigurable streams (e.g. pytest capture)
        enable_compilation_cache()
        if args.debug:
            hparams = "debug/" + hparams
        args.run_dir = os.path.join(args.exp_dir, args.exp_name, hparams)
        args.ckpt_dir = os.path.join(args.run_dir, "checkpoints")
        os.makedirs(args.ckpt_dir, exist_ok=True)
        args.seed = seed_everything(getattr(args, "seed", None))
        with open(os.path.join(args.run_dir, "args.txt"), "w") as f:
            json.dump(vars(args), f, indent=4)
        return args
