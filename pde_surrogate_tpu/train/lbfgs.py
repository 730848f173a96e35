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

__all__ = ["make_lbfgs_epoch", "lbfgs_optimizer", "run_adam_warmup"]


def run_adam_warmup(loss_fn: Callable, params, n_steps: int,
                    learning_rate: float, chunk: int = 100):
    """Run ``n_steps`` Adam steps as chunked ``lax.scan`` programs.

    The warmup-then-L-BFGS recipe both solvers default to (docs/RESULTS.md):
    scanning amortizes the per-dispatch tunnel round-trip (~50 ms eager) to
    one dispatch per ``chunk`` steps; a remainder chunk runs the exact step
    count requested.  Returns (params, final_loss).
    """
    aopt = optax.adam(learning_rate)
    ast = aopt.init(params)

    @functools.partial(jax.jit, static_argnames="length")
    def adam_chunk(p, st, length):
        def step(carry, _):
            p, st = carry
            l, g = jax.value_and_grad(loss_fn)(p)
            u, st = aopt.update(g, st)
            return (optax.apply_updates(p, u), st), l

        (p, st), _ = jax.lax.scan(step, (p, st), None, length=length)
        # loss of the RETURNED params (the scanned l's are pre-update, so
        # the last one is a step stale and a final-update blowup would
        # go unnoticed); one extra forward per chunk
        return p, st, loss_fn(p)

    if n_steps <= 0:
        return params, float(jax.jit(loss_fn)(params))
    n_full, rem = divmod(n_steps, chunk)
    loss = None
    for _ in range(n_full):
        params, ast, loss = adam_chunk(params, ast, chunk)
    if rem:
        params, ast, loss = adam_chunk(params, ast, rem)
    return params, float(loss)


def lbfgs_optimizer(memory_size: int = 50,
                    learning_rate: float | None = 0.5):
    """optax L-BFGS configured like torch's (the reference's optimizer).

    torch ``LBFGS(lr=0.5, max_iter=20, history_size=50)`` with its default
    ``line_search_fn=None`` takes *fixed* lr-scaled quasi-Newton steps.

    Measured on the conv-solver objective: from RANDOM init both variants
    fail (fixed steps reach 0.79 only via divergence+restart guards; zoom
    stalls in the first shallow basin at 3.6-19), but after a ~20k-step
    Adam warmup zoom polishes 0.041 -> 0.011 cleanly — the start point,
    not the linesearch, was the problem.  The drivers therefore default to
    Adam warmup + zoom; ``learning_rate=0.5`` + fixed steps matches the
    reference optimizer's semantics (same lr, history, fixed step) but not
    its exact trajectory: torch LBFGS damps its FIRST step by
    min(1, 1/||g||_1)·lr while optax caps the initial identity scaling by
    a reciprocal gradient norm — the two differ from iterate one.

    ``learning_rate=None`` switches to zoom linesearch (use
    ``make_lbfgs_epoch(..., with_linesearch=True)`` with it).
    """
    if learning_rate is None:
        return optax.lbfgs(
            learning_rate=None,
            memory_size=memory_size,
            # "one" (optax.lbfgs's own default) restarts each search from
            # the quasi-Newton unit step; the "keep" default of the raw
            # linesearch would seed from the previous accepted step, so one
            # tiny early-accepted step poisons every later search
            linesearch=optax.scale_by_zoom_linesearch(
                max_linesearch_steps=20, initial_guess_strategy="one"),
        )
    return optax.lbfgs(learning_rate=learning_rate, memory_size=memory_size,
                       linesearch=None)


def make_lbfgs_epoch(loss_fn: Callable, opt, iters_per_epoch: int = 20,
                     with_linesearch: bool = True):
    """Jitted function running ``iters_per_epoch`` L-BFGS steps.

    ``loss_fn(params) -> scalar`` must be pure (closure over data).
    ``with_linesearch=False`` is for fixed-step L-BFGS (torch-style
    ``lr`` steps, no value/grad cached in the optimizer state).
    Returns (params, opt_state) -> (params, opt_state, last_loss).
    """
    if with_linesearch:
        value_and_grad = optax.value_and_grad_from_state(loss_fn)
    else:
        plain_vg = jax.value_and_grad(loss_fn)
        value_and_grad = lambda params, state: plain_vg(params)

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
        # report the loss of the RETURNED params, not of the last iterate's
        # start: a blowup inside the final update would otherwise pair good
        # losses with garbage params (breaks restart-from-best guards)
        return params, opt_state, loss_fn(params)

    return epoch
