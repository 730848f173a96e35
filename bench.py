"""Benchmark: codec mixed-residual training throughput on one TPU chip.

The north-star config (BASELINE.md): DenseED blocks [6,8,6], K=16, init 48
(740k params), 64x64 grf_kle512 inputs, batch 32, label-free mixed-residual
loss — the hot loop of train_codec_mixed_residual.py in the reference.

Prints ONE JSON line:
  {"metric": ..., "value": samples/sec/chip, "unit": ..., "vs_baseline": r}

vs_baseline is measured against the PyTorch-CPU reference implementation
executing the identical training step on this container's CPU
(measured 2026-08-16 on this image: 3789 ms/step for batch 32 with the
reference's DenseED + Sobel losses + Adam => 8.44 samples/sec; see
BASELINE.md "north-star": the target is vs_baseline >= 10).

Robustness (round 5, after BENCH_r04.json landed rc=124/parsed=null): the
headline codec measurement populates the results dict FIRST; every further
section (concat reference, bf16 throughput mode, driver loop, cGlow) is
optional — gated on a wall-clock budget (BENCH_BUDGET_S, default 1500 s
from first exec) and wrapped so a failure marks the section skipped
instead of losing the run.  A SIGTERM (what `timeout` sends) triggers
emission of whatever is measured so far and exits 0.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from pde_surrogate_tpu.data.grf import sample_kle  # noqa: E402
from pde_surrogate_tpu.data.pipeline import DeviceDataset  # noqa: E402
from pde_surrogate_tpu.models.codec import DenseED  # noqa: E402
from pde_surrogate_tpu.ops.filters import SobelFilter  # noqa: E402
from pde_surrogate_tpu.train.codec_trainer import (  # noqa: E402
    create_state, make_mixed_residual_step)

TORCH_CPU_SAMPLES_PER_SEC = 8.44  # measured reference baseline (see docstring)
V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e (v5 lite) per-chip bf16 MXU peak
V5E_HBM_BYTES_PER_SEC = 819e9  # TPU v5e per-chip HBM bandwidth

# T0 survives the retry re-exec so the budget is measured from first launch
# (the external driver timeout brackets the whole invocation incl. retries).
_T0 = float(os.environ.setdefault("BENCH_T0", str(time.time())))
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))

RESULTS: dict = {}
_SKIPPED: list = []
_EMITTED = False


def _remaining() -> float:
    return _BUDGET_S - (time.time() - _T0)


def _emit() -> None:
    """Print the single machine-readable JSON line (at most once)."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    if _SKIPPED:
        RESULTS["sections_skipped"] = list(_SKIPPED)
    print(json.dumps(RESULTS))
    sys.stdout.flush()


def _on_term(signum, frame):  # noqa: ARG001
    """`timeout` sends SIGTERM: emit what's measured, exit clean so the
    round's artifact parses even when the window closes mid-section."""
    print(f"[bench] SIGTERM after {time.time() - _T0:.0f}s — emitting "
          f"partial results", file=sys.stderr)
    if "value" not in RESULTS:
        RESULTS.update({"metric": "codec_mixed_residual_train_samples_per_"
                        "sec_per_chip", "value": None, "unit": "samples/sec",
                        "vs_baseline": None, "partial": True})
    else:
        RESULTS["partial"] = True
    _SKIPPED.append("terminated")
    _emit()
    os._exit(0)


def _section(name: str, est_s: float, fn) -> None:
    """Run an optional bench section if the budget allows; a failure or a
    blown budget marks it skipped instead of killing the run."""
    if _remaining() < est_s:
        print(f"[bench] skipping {name}: {_remaining():.0f}s left < "
              f"{est_s:.0f}s estimate", file=sys.stderr)
        _SKIPPED.append(name)
        return
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — optional sections must not kill
        print(f"[bench] section {name} failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        _SKIPPED.append(name)


def _step_costs(step, state, x) -> tuple[float, float]:
    """XLA-reported (FLOPs, HBM bytes accessed) for one compiled train step
    (fwd+bwd+Adam).  Bytes accessed is the cost model's memory-traffic
    estimate — the roofline denominator for this HBM-bound workload."""
    try:
        cost = jax.jit(lambda s, b: step(s, b)).lower(state, x).compile() \
            .cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"]), float(cost.get("bytes accessed",
                                                    float("nan")))
    except Exception as e:  # cost model availability varies by backend
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)
        return float("nan"), float("nan")


def _json_num(value, ndigits):
    """round() that maps non-finite to None — NaN would make the output
    line invalid JSON (bare NaN tokens break strict parsers)."""
    return round(value, ndigits) if np.isfinite(value) else None


def main():
    signal.signal(signal.SIGTERM, _on_term)
    # BENCH_PLATFORM=cpu lets the pipeline be smoke-tested off-TPU (the
    # axon sitecustomize ignores JAX_PLATFORMS; jax.config is the only
    # honored switch, CLAUDE.md)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    imsize, batch = 64, 32
    from pde_surrogate_tpu.utils.config import enable_compilation_cache
    enable_compilation_cache()  # ~5 executables at 20-200 s remote compile
    print(f"[bench] devices: {jax.devices()} (budget: {_remaining():.0f}s "
          f"left of {_BUDGET_S:.0f})", file=sys.stderr)

    x = jnp.asarray(sample_kle(batch, imsize, 512, rng=0)[..., None])
    # shared_stats: per-group BN moments computed once per dense block and
    # reused by every later layer — identical math (CPU-bitwise-equal,
    # tests/test_codec.py), ~7% less HBM traffic on TPU
    # (logs/sharedstats_probe_r3b.log); the concat-impl reference row is
    # measured below
    model = DenseED(1, 3, imsize=imsize, blocks=[6, 8, 6], growth_rate=16,
                    init_features=48, shared_stats=True)
    state, tx = create_state(model, jax.random.key(0), x, lr_max=1e-3,
                             total_steps=100_000)
    step = make_mixed_residual_step(model, tx, SobelFilter(imsize), 10.0)

    # compile + warmup.  NOTE: fences are VALUE FETCHES throughout —
    # jax.block_until_ready is a no-op on the axon remote platform.
    t0 = time.time()
    state, metrics = step(state, x)
    float(metrics["loss"])
    print(f"[bench] compile+first step: {time.time() - t0:.1f}s",
          file=sys.stderr)
    for _ in range(20):
        state, metrics = step(state, x)
    float(metrics["loss"])

    # timed: resident-batch step time (the kernel-level number)
    n_steps = 100
    t0 = time.time()
    for _ in range(n_steps):
        state, metrics = step(state, x)
    loss_val = float(metrics["loss"])  # fence
    dt = (time.time() - t0) / n_steps
    sps = batch / dt
    print(f"[bench] {dt * 1e3:.2f} ms/step, {sps:.1f} samples/sec, "
          f"loss {loss_val:.4f}", file=sys.stderr)

    # achieved FLOP/s vs v5e peak ("actually fast, not merely faster than
    # CPU-torch"): XLA cost model FLOPs / measured step time
    flops, hbm_bytes = _step_costs(step, state, x)
    tflops = flops / dt / 1e12
    mfu = tflops * 1e12 / V5E_BF16_PEAK_FLOPS
    # "bytes accessed" is the cost model's PRE-FUSION operand traffic — an
    # upper bound on real HBM bytes (fused ops stay in registers/VMEM).
    # ratio = (naive traffic / peak BW) / measured time: >= 1 means the step
    # runs faster than even perfectly-streamed unfused traffic could, i.e.
    # XLA fusion is eliminating traffic and the step sits at the HBM wall.
    hbm_gbps = hbm_bytes / dt / 1e9
    hbm_ratio = hbm_gbps * 1e9 / V5E_HBM_BYTES_PER_SEC
    print(f"[bench] {flops / 1e9:.2f} GFLOP/step -> {tflops:.1f} TFLOP/s "
          f"({100 * mfu:.1f}% of v5e bf16 peak)", file=sys.stderr)
    print(f"[bench] {hbm_bytes / 1e9:.2f} GB/step pre-fusion traffic -> "
          f"{hbm_ratio:.2f}x the peak-BW streaming rate "
          f"(>=1 = at the HBM roofline)", file=sys.stderr)

    # the headline is now measured: populate the results dict so every
    # later section is pure upside (BENCH_r04 lost its round to a timeout
    # during the cGlow compile AFTER these numbers existed)
    RESULTS.update({
        "metric": "codec_mixed_residual_train_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/sec",
        "vs_baseline": round(sps / TORCH_CPU_SAMPLES_PER_SEC, 2),
        "gflop_per_step": _json_num(flops / 1e9, 2),
        "tflops_per_sec": _json_num(tflops, 2),
        "mfu_vs_v5e_bf16_peak": _json_num(mfu, 4),
        "prefusion_traffic_gb_per_sec": _json_num(hbm_gbps, 1),
        "hbm_roofline_ratio": _json_num(hbm_ratio, 4),
        "dense_stats_impl": "shared",
    })

    def concat_reference():
        # default concat-impl reference row (the round-2 headline config), so
        # the shared-stats gain stays auditable round over round
        model_cc = DenseED(1, 3, imsize=imsize, blocks=[6, 8, 6],
                           growth_rate=16, init_features=48)
        state_cc, tx_cc = create_state(model_cc, jax.random.key(0), x,
                                       lr_max=1e-3, total_steps=100_000)
        step_cc = make_mixed_residual_step(model_cc, tx_cc,
                                           SobelFilter(imsize), 10.0)
        state_cc, m = step_cc(state_cc, x)
        float(m["loss"])
        for _ in range(10):
            state_cc, m = step_cc(state_cc, x)
        float(m["loss"])
        t0 = time.time()
        for _ in range(50):
            state_cc, m = step_cc(state_cc, x)
        float(m["loss"])
        cc_sps = batch / ((time.time() - t0) / 50)
        print(f"[bench] concat-impl reference: {cc_sps:.1f} samples/sec "
              f"(shared-stats headline gain {100 * (sps / cc_sps - 1):.1f}%)",
              file=sys.stderr)
        RESULTS["concat_impl_f32_bs32_samples_per_sec"] = round(cc_sps, 2)

    def throughput_mode():
        # throughput-mode config: bf16 convs, batch 128 (same model/objective;
        # the headline metric above stays the baseline-comparable f32/bs32)
        big = 128
        xb = jnp.asarray(sample_kle(big, imsize, 512, rng=2)[..., None])
        model_tp = DenseED(1, 3, imsize=imsize, blocks=[6, 8, 6],
                           growth_rate=16, init_features=48,
                           dtype=jnp.bfloat16, shared_stats=True)
        state_tp, tx_tp = create_state(model_tp, jax.random.key(0), xb,
                                       lr_max=1e-3, total_steps=100_000)
        step_tp = make_mixed_residual_step(model_tp, tx_tp,
                                           SobelFilter(imsize), 10.0)
        state_tp, m = step_tp(state_tp, xb)
        float(m["loss"])
        for _ in range(10):
            state_tp, m = step_tp(state_tp, xb)
        float(m["loss"])
        t0 = time.time()
        for _ in range(50):
            state_tp, m = step_tp(state_tp, xb)
        float(m["loss"])
        dt_tp = (time.time() - t0) / 50
        tp_sps = big / dt_tp
        flops_tp, hbm_bytes_tp = _step_costs(step_tp, state_tp, xb)
        tp_hbm_ratio = hbm_bytes_tp / dt_tp / V5E_HBM_BYTES_PER_SEC
        print(f"[bench] throughput mode (bf16, bs{big}): {tp_sps:.0f} "
              f"samples/sec, {flops_tp / dt_tp / 1e12:.1f} TFLOP/s, "
              f"pre-fusion-traffic roofline ratio {tp_hbm_ratio:.2f}",
              file=sys.stderr)
        RESULTS["throughput_mode_bf16_bs128_samples_per_sec"] = \
            round(tp_sps, 2)
        RESULTS["throughput_mode_hbm_roofline_ratio"] = \
            _json_num(tp_hbm_ratio, 4)

    def driver_loop():
        # driver-loop throughput: the drivers' default hot loop (each epoch is
        # one device program; one value-fetch fence per epoch)
        from pde_surrogate_tpu.train.codec_trainer import make_epoch_fn
        n_data = 1024
        xs = jnp.asarray(sample_kle(n_data, imsize, 512, rng=1)[..., None])
        ds = DeviceDataset(xs, batch_size=batch, key=0)
        epoch_fn = make_epoch_fn(step.core)
        st, em = epoch_fn(state, ds.epoch_indices(0), *ds.arrays)  # compile
        float(jnp.mean(em["loss"]))
        t0 = time.time()
        n_epochs = 3
        for epoch in range(1, n_epochs + 1):
            st, em = epoch_fn(st, ds.epoch_indices(epoch), *ds.arrays)
            float(jnp.mean(em["loss"]))  # per-epoch fence, as the driver
        driver_sps = n_epochs * len(ds) * batch / (time.time() - t0)
        print(f"[bench] driver loop: {driver_sps:.1f} samples/sec "
              f"(incl. shuffle+gather)", file=sys.stderr)
        RESULTS["driver_loop_samples_per_sec"] = round(driver_sps, 2)

    def cglow():
        # cGlow reverse-KL step (the second flagship model): flagship 32x32
        # kle100 config (train_cglow_reverse_kl defaults).  Eager per-step is
        # that driver's default hot loop; the scanned-epoch ratio quantifies
        # the scan anomaly (docs/RESULTS.md).
        from pde_surrogate_tpu.models.glow import MultiScaleCondGlow
        from pde_surrogate_tpu.train.glow_trainer import (create_glow_state,
                                                          make_reverse_kl_step)
        gim, gbatch = 32, 32
        gx = jnp.asarray(sample_kle(gbatch, gim, 100, rng=3)[..., None])
        glow = MultiScaleCondGlow(img_size=gim, x_channels=1, y_channels=3,
                                  enc_blocks=[3, 4, 4], flow_blocks=[6, 6, 6])
        gstate, gtx = create_glow_state(glow, jax.random.key(0),
                                        jnp.zeros((gbatch, gim, gim, 3)), gx,
                                        lr_max=1.5e-3, total_steps=100_000)
        gstep = make_reverse_kl_step(glow, gtx, SobelFilter(gim), beta=150.0,
                                     weight_bound=50.0,
                                     n_out_pixels=3 * gim * gim)
        t0 = time.time()
        gstate, gm = gstep(gstate, gx)
        float(gm["loss"])
        print(f"[bench] cglow compile+first step: {time.time() - t0:.1f}s",
              file=sys.stderr)
        for _ in range(10):
            gstate, gm = gstep(gstate, gx)
        float(gm["loss"])
        n_glow = 50
        t0 = time.time()
        for _ in range(n_glow):
            gstate, gm = gstep(gstate, gx)
        float(gm["loss"])
        dt_glow = (time.time() - t0) / n_glow
        glow_sps = gbatch / dt_glow
        print(f"[bench] cglow reverse-KL: {dt_glow * 1e3:.2f} ms/step, "
              f"{glow_sps:.1f} samples/sec", file=sys.stderr)
        RESULTS["cglow_reverse_kl_samples_per_sec"] = round(glow_sps, 2)

    # optional sections, value-ordered; estimates are warm-cache costs plus
    # margin (a cold remote compile of the cGlow step alone ran 199 s in r4)
    _section("concat_reference", 90.0, concat_reference)
    _section("throughput_mode_bf16_bs128", 120.0, throughput_mode)
    _section("driver_loop", 90.0, driver_loop)
    _section("cglow_reverse_kl", 300.0, cglow)

    _emit()


def _wait_for_backend(max_wait_s: float = 1800.0) -> None:
    """Probe the backend in a SUBPROCESS (with a hard timeout) until a value
    fetch succeeds.  A DOWN backend makes in-process init HANG, not raise —
    the retry wrapper below can only catch errors, so gate first.  Mirrors
    tools/tpu_gate.sh; proceeds after max_wait_s either way."""
    import subprocess
    deadline = time.time() + max_wait_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax, jax.numpy as jnp; "
                 "print(float(jnp.ones(2).sum()))"],
                timeout=120, capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print("[bench] backend still down after gate window — "
                  "proceeding anyway", file=sys.stderr)
            return
        print("[bench] backend down; re-probing in 120s", file=sys.stderr)
        time.sleep(120)


if __name__ == "__main__":
    # transient "TPU backend error (Internal)" / UNAVAILABLE blips happen on
    # this platform (CLAUDE.md); the driver runs bench ONCE per round, so a
    # blip would cost the round's benchmark. Retry in a FRESH process (the
    # backend state is not trustworthy after an RPC failure).
    _wait_for_backend()
    attempt = int(os.environ.get("BENCH_ATTEMPT", "1"))
    try:
        main()
    except Exception as e:  # noqa: BLE001 — last-resort round-saver
        # round-4 measured backend-down WINDOWS of 30-70 min (not just
        # blips, logs/tpu_watchdog.log) — ride out most of one
        if attempt >= 6 or _EMITTED:
            raise
        sleep_s = float(os.environ.get("BENCH_RETRY_SLEEP", "300"))
        print(f"[bench] attempt {attempt} failed: {type(e).__name__}: {e} — "
              f"re-exec in {sleep_s:.0f}s", file=sys.stderr)
        time.sleep(sleep_s)
        os.environ["BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
