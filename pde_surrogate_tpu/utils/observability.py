"""Tracing, profiling, sanitizers, and structured logging.

The reference has essentially none of this (wall-clock brackets at
train_codec_mixed_residual.py:210,255-257 and ``autograd.detect_anomaly``
at train_cglow_reverse_kl.py:254).  The TPU-native equivalents
(SURVEY.md section 5):

* ``StepTimer`` — steps/sec + samples/sec with ``block_until_ready``
  fencing, so device async execution doesn't fake the numbers;
* ``profile_trace`` — ``jax.profiler`` context writing a TensorBoard trace;
* ``debug_nans`` — toggles jax's NaN checker (disables fusion; switchable,
  like detect_anomaly);
* ``JsonlLogger`` — structured per-epoch metrics alongside the reference's
  txt/pdf outputs.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import jax

__all__ = ["StepTimer", "profile_trace", "debug_nans", "JsonlLogger"]


class StepTimer:
    """Throughput meter.

    ``fence`` accepts any array to block on, but note that
    ``jax.block_until_ready`` is a NO-OP on the axon remote platform
    (docs/DESIGN.md section 8) — callers there must fence with a value
    fetch (``float(loss)``) before calling ``result()``, which is what the
    drivers do.
    """

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.reset()

    def reset(self):
        self._t0 = None
        self._steps = 0

    def start(self, fence=None):
        if fence is not None:
            jax.block_until_ready(fence)
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self, n: int = 1):
        self._steps += n

    def result(self, fence=None) -> dict:
        if fence is not None:
            jax.block_until_ready(fence)
        dt = time.perf_counter() - self._t0
        steps_per_sec = self._steps / dt if dt > 0 else float("inf")
        return {"seconds": dt, "steps": self._steps,
                "steps_per_sec": steps_per_sec,
                "samples_per_sec": steps_per_sec * self.batch_size}


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace around a code region (view with TensorBoard)."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enabled: bool = True):
    """Scoped jax_debug_nans — the detect_anomaly analog.  Disables some
    fusion; keep off for production runs."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class JsonlLogger:
    """Append-only structured metrics log (one JSON object per line)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path

    def log(self, record: dict):
        record = {k: (float(v) if hasattr(v, "item") else v)
                  for k, v in record.items()}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
