"""Evaluation metrics — the acceptance quantities of the reference.

Definitions preserved exactly (they are the parity bar, SURVEY.md section 6):

* relative L2 (NRMSE) per output channel:
  ``sqrt(sum_HW (out-tgt)^2 / sum_HW tgt^2)`` averaged over the test set
  (train_codec_mixed_residual.py:180-181,196).
* R^2 per channel: ``1 - SSE / y_variation`` with ``y_variation`` the test
  set's per-channel sum of squared deviations from its mean
  (train_codec_mixed_residual.py:182,197; denominator utils/load.py:28-30).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["relative_l2", "squared_error_sum", "r2_score", "MetricAccumulator"]


def relative_l2(output: jax.Array, target: jax.Array) -> jax.Array:
    """Per-sample per-channel relative L2, (B, C), NHWC inputs."""
    err2 = jnp.sum((output - target) ** 2, axis=(1, 2))
    ref2 = jnp.sum(target ** 2, axis=(1, 2))
    return jnp.sqrt(err2 / ref2)


def squared_error_sum(output: jax.Array, target: jax.Array) -> jax.Array:
    """Per-sample per-channel SSE over H, W, (B, C)."""
    return jnp.sum((output - target) ** 2, axis=(1, 2))


def r2_score(sse_per_channel: jax.Array, y_variation: jax.Array) -> jax.Array:
    """R^2 = 1 - SSE / y_variation, per channel."""
    return 1.0 - sse_per_channel / y_variation


class MetricAccumulator:
    """Streaming accumulation of relative-L2 and SSE over test batches."""

    def __init__(self):
        self._rel_l2 = []
        self._sse = []

    def update(self, output: jax.Array, target: jax.Array):
        self._rel_l2.append(relative_l2(output, target))
        self._sse.append(squared_error_sum(output, target))

    def result(self, y_variation):
        rel = jnp.concatenate(self._rel_l2, 0).mean(0)
        sse = jnp.concatenate(self._sse, 0).sum(0)
        return {"nrmse": rel, "r2": r2_score(sse, jnp.asarray(y_variation))}
