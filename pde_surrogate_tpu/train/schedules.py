"""Learning-rate schedules.

`one_cycle` reproduces the reference's ``OneCycleScheduler``
(utils/practices.py:16-35) exactly: linear warmup from lr_max/div_factor to
lr_max over the first ``pct_start`` of training, then cosine annealing down
to lr_low/1e4.  Exposed both as a pct -> lr function (reference semantics)
and as an optax step schedule (jit-friendly: the branch is a `jnp.where`,
not Python control flow, so it traces once).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["annealing_linear", "annealing_cos", "one_cycle",
           "one_cycle_schedule", "find_lr_schedule"]


def annealing_linear(start, end, pct):
    """Linear anneal (utils/practices.py:6-7)."""
    return start + pct * (end - start)


def annealing_cos(start, end, pct):
    """Cosine anneal from start to end as pct goes 0 -> 1 (utils/practices.py:10-13)."""
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def one_cycle(lr_max: float, div_factor: float = 25.0, pct_start: float = 0.3):
    """pct in [0,1] -> lr, the reference's scheduler as a pure function."""
    lr_low = lr_max / div_factor

    def schedule(pct):
        # clamp: the cosine is periodic, so steps past total_steps would
        # ride BACK UP toward lr_max (the reference's Python loop never
        # exceeds total_steps; an optax schedule is open-ended)
        pct = jnp.clip(jnp.asarray(pct, jnp.float32), 0.0, 1.0)
        warm = annealing_linear(lr_low, lr_max, pct / pct_start)
        cool = annealing_cos(lr_max, lr_low / 1e4,
                             (pct - pct_start) / (1.0 - pct_start))
        return jnp.where(pct <= pct_start, warm, cool)

    return schedule


def one_cycle_schedule(lr_max: float, total_steps: int,
                       div_factor: float = 25.0, pct_start: float = 0.3):
    """optax-style step -> lr schedule.

    The reference computes pct = step/total_steps with step starting at 1
    (train_codec_mixed_residual.py:235-237); preserved here.
    """
    pct_fn = one_cycle(lr_max, div_factor, pct_start)

    def schedule(count):
        return pct_fn((count + 1) / total_steps)

    return schedule


def find_lr_schedule(init_value: float = 1e-8, final_value: float = 10.0,
                     num_steps: int = 100):
    """Exponential LR-range-test schedule (utils/practices.py:45-83)."""
    mult = (final_value / init_value) ** (1.0 / num_steps)

    def schedule(count):
        return init_value * mult ** count

    return schedule
