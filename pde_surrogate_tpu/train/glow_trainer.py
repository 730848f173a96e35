"""Jitted training/eval steps for cGlow reverse-KL training.

The reference's hot loop (train_cglow_reverse_kl.py:250-273): sample
y ~ p(y|x) through the reverse flow, evaluate the physics residual on the
sample, add the predictive-entropy term, backprop through the whole flow.

TPU-native aspects:
* one jit region per step with explicit PRNG key folding (bitwise
  reproducible — the north-star's "bitwise-stable" requirement);
* the NaN guard is ``optax.apply_if_finite``: a step whose gradients
  contain NaN/Inf is skipped (parameters untouched) instead of crashing —
  the functional replacement for ``autograd.detect_anomaly`` +
  manual resume (train_cglow_reverse_kl.py:254, README.md:84-85);
* ActNorm data-init is an explicit transform over a recorded forward pass
  (train_cglow_reverse_kl.py:239-248).
"""

from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..models.flow import actnorm_stats_to_params
from ..ops.darcy import (conv_boundary_condition, conv_constitutive_constraint,
                         conv_continuity_constraint, fv_cg_anchors)
from ..ops.filters import SobelFilter
from ..utils.metrics import relative_l2, squared_error_sum
from .codec_trainer import _adam_l2 as _adam
from .schedules import one_cycle_schedule

__all__ = ["GlowState", "create_glow_state", "make_reverse_kl_step",
           "make_forward_kl_step", "make_glow_eval_step",
           "make_glow_eval_epoch_fn", "data_init_actnorm", "glow_lr"]

LN2 = math.log(2.0)


class GlowState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    constants: Any          # LU permutation matrices and signs (non-trained)
    opt_state: Any
    key: jax.Array          # base PRNG key; per-step keys fold in `step`


def create_glow_state(model, key, sample_y, sample_x, lr_max: float,
                      total_steps: int, div_factor: float = 2.0,
                      pct_start: float = 0.3, weight_decay: float = 0.0,
                      nan_guard: bool = True):
    """Init variables + Adam/OneCycle (train_cglow_reverse_kl.py:140-143)."""
    init_key, state_key = jax.random.split(key)
    variables = model.init(init_key, sample_y, sample_x, train=False)
    schedule = one_cycle_schedule(lr_max, total_steps, div_factor, pct_start)
    tx = optax.inject_hyperparams(_adam, static_args=("weight_decay",))(
        learning_rate=schedule, weight_decay=weight_decay)
    if nan_guard:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    params = variables["params"]
    state = GlowState(jnp.zeros((), jnp.int32), params,
                      variables.get("batch_stats", FrozenDict()),
                      variables.get("constants", FrozenDict()),
                      tx.init(params), state_key)
    return state, tx


def glow_lr(state: GlowState) -> float:
    hp = state.opt_state
    # unwrap apply_if_finite if present — stop at the first state that
    # carries hyperparams (InjectHyperparamsState itself has an
    # `inner_state` field, so `hasattr(hp, "inner_state")` alone would
    # over-unwrap when nan_guard=False)
    while not hasattr(hp, "hyperparams"):
        hp = hp.inner_state
    return float(hp.hyperparams["learning_rate"])


def _variables(state: GlowState):
    return {"params": state.params, "batch_stats": state.batch_stats,
            "constants": state.constants}


def make_reverse_kl_step(model, tx, sobel: SobelFilter, beta: float,
                         weight_bound: float, n_out_pixels: int,
                         physics: str = "sobel",
                         fvcg_weight: float = 100.0,
                         fvcg_flux_weight: float = 0.0,
                         fvcg_iters: int | None = None):
    """Label-free reverse-KL step (train_cglow_reverse_kl.py:250-273).

    Per-step PRNG keys fold the step counter into the state's base key, so
    the step is scannable (codec_trainer.make_epoch_fn) with bitwise-stable
    randomness; the jitted step exposes the body as ``.core``.

    ``physics='sobel_fvcg'`` adds the codec hybrid's label-free CG anchors
    (ops/darcy.fv_cg_anchors, round 4) to the per-sample physics loss:
    every drawn sample's pressure is pulled toward the FV solution
    (killing the flat interior-offset direction of the Sobel residual,
    exactly as in the codec) and, with ``fvcg_flux_weight > 0``, its
    fluxes toward the CG-corrected pressure's conservative face fluxes.
    ``physics='fvcg'`` drops the Sobel terms entirely and uses the pure
    CG-anchor objective (codec analog: ops/darcy.fv_cg_error_loss —
    ``pde = err_u + err_flux``, Dirichlet-only boundary weight), the
    recommended codec recipe on discontinuous K since round 4 (channelized
    label-free at the supervised ceiling, docs/RESULTS.md; the Sobel flux
    term's inconsistent discontinuity stencils were the binding
    constraint).  ``physics='sobel'`` is byte-identical to the round-3
    objective (/root/reference/train_cglow_reverse_kl.py:250-273 parity
    path).
    """
    if physics not in ("sobel", "sobel_fvcg", "fvcg"):
        raise ValueError(f"unknown glow physics loss: {physics}")

    def step(state: GlowState, x):
        key = jax.random.fold_in(state.key, state.step)

        def loss_fn(params):
            (output, log_likelihood), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats,
                 "constants": state.constants},
                x, key=key, train=True, method=model.generate,
                mutable=["batch_stats"])
            diri, neum = conv_boundary_condition(output)
            # anchor terms are logged under their own keys: under fvcg the
            # Sobel-residual key would otherwise silently change meaning
            # to an error norm, and 'boundary' only reports what the loss
            # actually penalizes (advisor finding, ADVICE.md r4)
            extra = {}
            if physics == "fvcg":
                err_u, err_flux = fv_cg_anchors(x, output, fvcg_iters)
                residual = err_u + err_flux
                loss_pde = residual + diri * weight_bound
                boundary = diri
                extra = {"anchor_u": err_u, "anchor_flux": err_flux}
            else:
                residual = (conv_constitutive_constraint(x, output, sobel)
                            + conv_continuity_constraint(output, sobel))
                loss_pde = residual + (diri + neum) * weight_bound
                boundary = diri + neum
                if physics == "sobel_fvcg":
                    err_u, err_flux = fv_cg_anchors(x, output, fvcg_iters)
                    anchor = (fvcg_weight * err_u
                              + fvcg_flux_weight * err_flux)
                    loss_pde = loss_pde + anchor
                    residual = residual + anchor
                    extra = {"anchor_u": err_u, "anchor_flux": err_flux}
            neg_entropy = log_likelihood.mean() / LN2 / n_out_pixels
            loss = loss_pde * beta + neg_entropy
            return loss, (mutated["batch_stats"], residual, boundary,
                          neg_entropy, extra)

        (loss, (bstats, residual, boundary, neg_ent, extra)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = GlowState(state.step + 1, params, bstats, state.constants,
                              opt_state, state.key)
        metrics = {"loss": loss, "residual": residual, "boundary": boundary,
                   "neg_entropy": neg_ent, **extra}
        return new_state, metrics

    jitted = jax.jit(step, donate_argnums=(0,))
    jitted.core = step
    return jitted


def make_forward_kl_step(model, tx, n_out_pixels: int):
    """Maximum-likelihood (forward-KL) step: maximize log p(y|x) of labeled
    pairs through the density path y -> z.

    The reference ships this capability in the model but no driver
    (models/glow_msc.py:113-114, train path y->x only); provided here as a
    first-class step for data-driven flow training.  Loss is negative
    log-likelihood in bits/pixel.  Build the model with
    ``train_sampling=False`` so the density path avoids matrix inverses.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: GlowState, x, y):
        def loss_fn(params):
            (_, logp, _), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats,
                 "constants": state.constants},
                y, x, train=True, mutable=["batch_stats"])
            bits_per_pixel = -logp.mean() / LN2 / n_out_pixels
            return bits_per_pixel, mutated["batch_stats"]

        (loss, bstats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = GlowState(state.step + 1, params, bstats, state.constants,
                              opt_state, state.key)
        return new_state, {"loss": loss, "bits_per_pixel": loss}

    return step


def make_glow_eval_step(model, sobel: SobelFilter, beta: float,
                        weight_bound: float, n_out_pixels: int,
                        n_samples: int = 0):
    """Test step (train_cglow_reverse_kl.py:164-228).

    ``n_samples=0``: evaluate one generated sample (the cheap per-epoch
    path); ``n_samples>0``: predictive-mean over that many samples (the
    reference's every-10-epochs path).  The entropy term is computed from
    the *test* batch's own log-likelihood (fixing the reference bug that
    reused the training loop's global, train_cglow_reverse_kl.py:185 —
    SURVEY.md section 2.5).
    """

    def step(state: GlowState, x, y, key):
        if n_samples > 0:
            samples = model.apply(_variables(state), x, n_samples, key,
                                  temperature=1.0, train=False,
                                  method=model.sample)
            output = samples.mean(axis=0)
            _, log_likelihood = model.apply(
                _variables(state), x, key=key, train=False,
                method=model.generate)
        else:
            output, log_likelihood = model.apply(
                _variables(state), x, key=key, train=False,
                method=model.generate)
        residual = (conv_constitutive_constraint(x, output, sobel)
                    + conv_continuity_constraint(output, sobel))
        diri, neum = conv_boundary_condition(output)
        loss_pde = residual + (diri + neum) * weight_bound
        neg_entropy = log_likelihood.mean() / LN2 / n_out_pixels
        loss = loss_pde * beta + neg_entropy
        return {"loss": loss, "residual": residual, "boundary": diri + neum,
                "neg_entropy": neg_entropy, "output": output,
                "rel_l2": relative_l2(output, y),
                "sse": squared_error_sum(output, y)}

    jitted = jax.jit(step)
    jitted.core = step
    return jitted


def make_glow_eval_epoch_fn(eval_core, sharding=None):
    """The WHOLE cGlow test set as one device program (eval mirror of
    ``make_glow_epoch_fn``; codec analog: codec_trainer.make_eval_epoch_fn).

    The round-3 driver's ``test()`` dispatched one jitted step per test
    batch — ~8 tunnel round-trips (~30 ms RTT each) per eval epoch, every
    epoch of a 400-epoch run.  Scanning the eval body over pre-gathered
    batches with the loop-invariant state leaves OUT of the carry makes it
    one dispatch.  Per-batch PRNG keys enter as a scan input, so the caller
    reproduces the eager loop's keys exactly (equivalence-tested).

    Returns jitted ``(state, idx, keys, *arrays) -> metrics`` with metrics
    stacked per batch; the per-batch ``output`` field is dropped (plot
    epochs fetch samples separately).
    """
    from .codec_trainer import _epoch_sharding, _gather_epoch

    epoch_sharding = _epoch_sharding(sharding)

    @jax.jit
    def run_eval(state: GlowState, idx, keys, *arrays):
        epoch = _gather_epoch(idx, arrays, epoch_sharding)

        def body(carry, batch_and_key):
            key = batch_and_key[-1]
            out = eval_core(state, *batch_and_key[:-1], key)
            return carry, {k: v for k, v in out.items() if k != "output"}

        _, metrics = jax.lax.scan(body, 0, (*epoch, keys))
        return metrics

    return run_eval


def data_init_actnorm(model, state: GlowState, y, x) -> GlowState:
    """One-batch ActNorm data initialization (reference --data-init,
    train_cglow_reverse_kl.py:239-248): run the density path y -> z
    recording ActNorm inputs, then set weight=1/std, bias=-mean/std.

    The reference initializes ActNorms lazily *during* one forward, so
    each layer's statistics see the already-initialized earlier layers —
    Gauss-Seidel semantics.  The round-4 implementation instead repeated
    a record-ALL/update-ALL sweep (Jacobi), which DIVERGES oscillating on
    deep stacks (measured at the 64^2 canonical config: the deepest
    actnorm's |weight| swung 9 -> 0.02 -> 3e4 -> 2e-4 over four sweeps,
    and training NaN'd from epoch 1 — logs/cglow_kle512_im64_canonical_
    200ep_datainit_nan.log).  This version reproduces the reference's
    sequential semantics exactly: one forward per layer, updating only
    the next layer in density-execution order, so every layer normalizes
    its TRUE input under the already-initialized prefix.
    """
    from ..models.flow import actnorm_module_paths

    _, mutated = model.apply(
        _variables(state), y, x, train=False,
        mutable=["actnorm_stats", "batch_stats"])
    order = actnorm_module_paths(dict(mutated["actnorm_stats"]))
    for path in order:
        _, mutated = model.apply(
            _variables(state), y, x, train=False,
            mutable=["actnorm_stats", "batch_stats"])
        params = actnorm_stats_to_params(mutated["actnorm_stats"],
                                         state.params, only=path)
        state = state._replace(params=params)
    return state


def make_glow_epoch_fn(step_core, sharding=None):
    """One full cGlow epoch as a single device program, invariants OUT of
    the scan carry.

    The generic ``codec_trainer.make_epoch_fn`` scans with the whole state
    as carry; for ``GlowState`` that drags the loop-invariant ``constants``
    pytree (LU permutation matrices/signs) and the base PRNG key through
    every iteration, and XLA materializes carry copies per step — measured
    571.8 ms/step vs 26.6 eager at the flagship 32x32 config.  Keeping the
    invariant leaves as plain jit arguments and carrying only
    (step, params, batch_stats, opt_state) is 25.5 ms/step — scan wins
    once the carry is minimal (`logs/glow_scan_probe_r3.log`).

    Returns jitted ``(state, idx, *arrays) -> (state, metrics)`` exactly
    like ``make_epoch_fn`` (bitwise-equal to the eager loop: per-step keys
    fold ``state.step``).
    """
    from .codec_trainer import _epoch_sharding, _gather_epoch

    epoch_sharding = _epoch_sharding(sharding)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_epoch(state: GlowState, idx, *arrays):
        epoch = _gather_epoch(idx, arrays, epoch_sharding)
        constants, key = state.constants, state.key

        def body(carry, batch):
            st = GlowState(carry[0], carry[1], carry[2], constants,
                           carry[3], key)
            st, metrics = step_core(st, *batch)
            return (st.step, st.params, st.batch_stats,
                    st.opt_state), metrics

        carry0 = (state.step, state.params, state.batch_stats,
                  state.opt_state)
        carry, metrics = jax.lax.scan(body, carry0, epoch)
        new_state = GlowState(carry[0], carry[1], carry[2], constants,
                              carry[3], key)
        return new_state, metrics

    return run_epoch
