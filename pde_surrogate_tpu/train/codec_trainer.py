"""Jitted training/eval steps for the DenseED codec drivers.

Covers both reference drivers:
  * physics-constrained (label-free) mixed-residual training
    (train_codec_mixed_residual.py:224-239)
  * data-driven maximum-likelihood (MSE) training
    (train_codec_max_likelihood.py:201-213)

One fused jit region per step: forward, physics loss (MXU stencils),
backward, optimizer update, BN running stats — with buffer donation so the
parameters update in place in HBM.  The LR schedule is folded into optax
(inject_hyperparams) so per-step Python never touches the optimizer.

Under a data mesh the same step runs SPMD: batches sharded on the leading
axis, state replicated; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..ops.darcy import (flux_pressure_consistency, fv_cg_anchors,
                         fv_cg_error_loss, fv_mixed_residual_loss,
                         mixed_residual_loss)
from ..ops.filters import SobelFilter
from ..utils.metrics import relative_l2, squared_error_sum
from .schedules import one_cycle_schedule

__all__ = ["CodecState", "create_state", "make_mixed_residual_step",
           "make_mle_step", "make_eval_step", "make_epoch_fn",
           "make_eval_epoch_fn", "current_lr"]


class CodecState(NamedTuple):
    """Replicated training state (a plain pytree: easy to checkpoint/shard)."""
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_state(model, key, sample_input, lr_max: float, total_steps: int,
                 div_factor: float = 2.0, pct_start: float = 0.3,
                 weight_decay: float = 0.0, schedule=None):
    """Initialize params/batch_stats and the optax Adam + OneCycle optimizer.

    Reference optimizer: Adam(lr, weight_decay) + OneCycleScheduler
    (train_codec_mixed_residual.py:151-154).  ``schedule`` overrides the
    OneCycle step->lr function (used by the --find-lr range test).
    """
    variables = model.init(key, sample_input, train=False)
    if schedule is None:
        schedule = one_cycle_schedule(lr_max, total_steps, div_factor,
                                      pct_start)
    tx = optax.inject_hyperparams(_adam_l2, static_args=("weight_decay",))(
        learning_rate=schedule, weight_decay=weight_decay)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    opt_state = tx.init(params)
    state = CodecState(jnp.zeros((), jnp.int32), params, batch_stats, opt_state)
    return state, tx


def _adam_l2(learning_rate, weight_decay: float = 0.0):
    """Adam with decoupled-from-schedule L2 (torch Adam weight_decay adds
    wd * p to the gradient before the moment updates)."""
    parts = []
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.adam(learning_rate))
    return optax.chain(*parts)


def current_lr(state: CodecState) -> float:
    """Scheduled LR at the current step (for logging)."""
    hp = state.opt_state.hyperparams
    return float(hp["learning_rate"])


def _dropout_rngs(state: CodecState, seed: int = 0):
    """Per-step dropout rng folded from ``state.step`` (scan == loop bitwise);
    harmless when drop_rate == 0 (flax only draws it if a Dropout is live)."""
    return {"dropout": jax.random.fold_in(jax.random.key(seed), state.step)}


def _physics_loss(physics: str, x, output, sobel, weight_bound, nonlinear,
                  fvcg_weight: float = 100.0,
                  fvcg_flux_weight: float = 0.0,
                  fvcg_iters: int | None = None):
    """Dispatch between label-free objectives: 'sobel' = the reference's
    mixed residual (models/darcy.py:162-233); 'fv' = the exactly-
    identifiable FV residual (ill-conditioned — measured negative result,
    docs/RESULTS.md); 'fvcg' = the CG-preconditioned error objective
    (ops/darcy.fv_cg_error_loss, round-3); 'sobel_fvcg' = the hybrid:
    Sobel mixed residual (best flux supervision) + fvcg_weight x the
    CG-recovered pressure-error norm (exact label-free u anchor — kills
    the flat interior-offset direction behind the u-drift lottery and the
    channelized u wall) + fvcg_flux_weight x the flux anchor against the
    CG-corrected pressure's conservative face fluxes (round 4 —
    ops/darcy.fv_cg_anchors; 0 reproduces the round-3 hybrid exactly).
    ``fvcg_iters=None`` scales the CG depth with the grid size."""
    if physics == "sobel":
        return mixed_residual_loss(x, output, sobel, weight_bound, nonlinear)
    if physics == "sobel_fvcg":
        if nonlinear is not None:
            raise ValueError("physics='sobel_fvcg' supports the linear law "
                             "only")
        loss, (pde, diri, neum) = mixed_residual_loss(
            x, output, sobel, weight_bound, None)
        err_u, err_flux = fv_cg_anchors(x, output, fvcg_iters)
        anchor = fvcg_weight * err_u + fvcg_flux_weight * err_flux
        return loss + anchor, (pde + anchor, diri, neum)
    if physics in ("fv", "fvcg"):
        if nonlinear is not None:
            raise ValueError(f"physics='{physics}' supports the linear law "
                             f"only")
        if physics == "fv":
            return fv_mixed_residual_loss(x, output, weight_bound)
        return fv_cg_error_loss(x, output, weight_bound, fvcg_iters)
    raise ValueError(f"unknown physics loss: {physics}")


def make_mixed_residual_step(model, tx, sobel: SobelFilter,
                             weight_bound: float = 10.0,
                             nonlinear: str | None = None,
                             dropout_seed: int = 0,
                             physics: str = "sobel",
                             fvcg_weight: float = 100.0,
                             fvcg_flux_weight: float = 0.0,
                             fvcg_iters: int | None = None):
    """Label-free physics-constrained step: batch is (K,) images only.

    The returned jitted step exposes the un-jitted body as ``.core`` so
    ``make_epoch_fn`` can scan it.
    """

    def step(state: CodecState, x):
        def loss_fn(params):
            output, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
                rngs=_dropout_rngs(state, dropout_seed))
            loss, (pde, dirichlet, neumann) = _physics_loss(
                physics, x, output, sobel, weight_bound, nonlinear,
                fvcg_weight, fvcg_flux_weight, fvcg_iters)
            return loss, (mutated["batch_stats"], pde, dirichlet, neumann)

        (loss, (bstats, pde, diri, neum)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = CodecState(state.step + 1, params, bstats, opt_state)
        metrics = {"loss": loss, "loss_pde": pde, "loss_dirichlet": diri,
                   "loss_neumann": neum}
        return new_state, metrics

    jitted = jax.jit(step, donate_argnums=(0,))
    jitted.core = step
    return jitted


def make_mle_step(model, tx, dropout_seed: int = 0):
    """Data-driven MSE step (train_codec_max_likelihood.py:201-213)."""

    def step(state: CodecState, x, y):
        def loss_fn(params):
            output, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
                rngs=_dropout_rngs(state, dropout_seed))
            loss = jnp.mean((output - y) ** 2)
            return loss, mutated["batch_stats"]

        (loss, bstats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = CodecState(state.step + 1, params, bstats, opt_state)
        return new_state, {"loss": loss}

    jitted = jax.jit(step, donate_argnums=(0,))
    jitted.core = step
    return jitted


def make_epoch_fn(step_core: Callable, sharding=None):
    """One FULL epoch as a single device program.

    ``lax.scan`` over per-step gather indices: shuffle-gather + forward +
    physics loss + backward + Adam all fuse into one executable, so an epoch
    costs ONE dispatch over the 30 ms-RTT tunnel instead of steps_per_epoch
    (and the hot loop no longer stalls when the host CPU is busy).

    The dataset arrays are explicit jit ARGUMENTS, never closure captures:
    captured device arrays are serialized as constants into the remote
    compile payload (multi-100MB requests hit the tunnel's HTTP length
    limit) and re-shipped with dispatches.

    Args:
      step_core: un-jitted ``(state, *batch) -> (state, metrics)`` (the
        ``.core`` of make_mixed_residual_step / make_mle_step).
      sharding: optional batch NamedSharding — gathered batches are
        constrained to it so the scanned step runs SPMD over the data mesh.

    Returns:
      jitted ``(state, idx, *arrays) -> (state, metrics)`` with ``idx`` of
      shape (steps_per_epoch, batch) from DeviceDataset.epoch_indices,
      ``arrays`` the device-resident DeviceDataset.arrays, and metrics
      stacked per step (fetch once per epoch).
    """

    epoch_sharding = _epoch_sharding(sharding)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_epoch(state: CodecState, idx, *arrays):
        epoch = _gather_epoch(idx, arrays, epoch_sharding)

        def body(st, batch):
            return step_core(st, *batch)

        return jax.lax.scan(body, state, epoch)

    return run_epoch


def _epoch_sharding(sharding):
    """Sharding for the (steps, batch, ...) epoch tensor: keep the batch
    axis of ``sharding`` (a per-batch NamedSharding), replicate steps."""
    if sharding is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(sharding.mesh, PartitionSpec(None, *sharding.spec))


def _gather_epoch(idx, arrays, epoch_sharding):
    """ONE epoch-sized gather up front, then scan slices it natively — a
    per-iteration gather over the full dataset measured ~5 ms/step at 64x64
    (it scaled with dataset size, not model FLOPs).  ``arrays`` must be jit
    ARGUMENTS of the caller, never closure captures (multi-100MB constants
    in the remote compile payload)."""
    epoch = tuple(
        jnp.take(a, idx.reshape(-1), axis=0)
        .reshape(idx.shape + a.shape[1:]) for a in arrays)
    if epoch_sharding is not None:
        epoch = tuple(jax.lax.with_sharding_constraint(e, epoch_sharding)
                      for e in epoch)
    return epoch


def make_eval_step(model, sobel: SobelFilter, weight_bound: float = 10.0,
                   nonlinear: str | None = None, physics: str = "sobel",
                   fvcg_weight: float = 100.0,
                   fvcg_flux_weight: float = 0.0,
                   fvcg_iters: int | None = None):
    """Test-set step: physics loss + per-sample metrics vs targets.

    Mirrors the reference test() (train_codec_mixed_residual.py:166-206):
    BN in eval mode (running stats), physics loss on the test batch, and the
    (rel_l2, sse) per-channel statistics for NRMSE / R^2.  The un-jitted
    body is exposed as ``.core`` for ``make_eval_epoch_fn``.
    """

    def step(state: CodecState, x, y):
        output = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False)
        loss, (pde, diri, neum) = _physics_loss(
            physics, x, output, sobel, weight_bound, nonlinear, fvcg_weight,
            fvcg_flux_weight, fvcg_iters)
        return {
            "loss": loss,
            "rel_l2": relative_l2(output, y),
            "sse": squared_error_sum(output, y),
            # label-free drift metric (ops/darcy.flux_pressure_consistency):
            # needs no labels, detects the interior u offset the physics
            # loss cannot see
            "consistency": flux_pressure_consistency(x, output),
            "output": output,
        }

    jitted = jax.jit(step)
    jitted.core = step
    return jitted


def make_eval_epoch_fn(eval_core: Callable, sharding=None):
    """The WHOLE test set as one device program (eval mirror of
    ``make_epoch_fn``): gather all test batches, ``lax.scan`` the eval body,
    return per-batch-stacked metrics.  The per-batch ``output`` field is
    dropped (plot epochs use the eager per-batch path, which needs it).

    Saves steps_per_epoch dispatches over the ~30 ms-RTT tunnel on EVERY
    eval epoch — at the canonical 512-sample/bs64 eval that is ~7 round
    trips per epoch, a noticeable slice of total wall time at long
    schedules.
    """

    epoch_sharding = _epoch_sharding(sharding)

    @jax.jit
    def run_eval(state: CodecState, idx, *arrays):
        epoch = _gather_epoch(idx, arrays, epoch_sharding)

        def body(carry, batch):
            out = eval_core(state, *batch)
            return carry, {k: v for k, v in out.items() if k != "output"}

        _, metrics = jax.lax.scan(body, 0, epoch)
        return metrics

    return run_eval
