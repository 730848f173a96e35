"""L-BFGS optimization for the per-instance solver nets.

The reference drives its single-instance solvers with torch L-BFGS
(lr 0.5, max_iter 20 per optimizer.step, history 50 —
solve_conv_mixed_residual.py:124-125, solve_fc_mixed_residual.py:110-111):
each "epoch" runs up to 20 closure evaluations.

Here one epoch is a jitted `lax.scan` of ``iters_per_epoch`` optax L-BFGS
steps with zoom linesearch — the entire inner loop compiles to a single XLA
computation; Python never sees intermediate iterates.  Convergence parity
is by final relative-L2, not trajectory equality (SURVEY.md "hard parts").
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import optax

__all__ = ["make_lbfgs_epoch", "lbfgs_optimizer"]


def lbfgs_optimizer(memory_size: int = 50):
    """optax L-BFGS with zoom linesearch (the torch-LBFGS role)."""
    return optax.lbfgs(
        learning_rate=None,  # linesearch-scaled steps
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=20),
    )


def make_lbfgs_epoch(loss_fn: Callable, opt, iters_per_epoch: int = 20):
    """Jitted function running ``iters_per_epoch`` L-BFGS steps.

    ``loss_fn(params) -> scalar`` must be pure (closure over data).
    Returns (params, opt_state) -> (params, opt_state, last_loss).
    """
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    @jax.jit
    def epoch(params, opt_state):
        def step(carry, _):
            params, opt_state = carry
            value, grad = value_and_grad(params, state=opt_state)
            updates, opt_state = opt.update(
                grad, opt_state, params, value=value, grad=grad,
                value_fn=loss_fn)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), value

        (params, opt_state), values = jax.lax.scan(
            step, (params, opt_state), None, length=iters_per_epoch)
        return params, opt_state, values[-1]

    return epoch
