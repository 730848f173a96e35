"""Numerical parity audit vs the reference implementation.

Runs the same inputs through this framework's ops and the PyTorch reference
(imported from /root/reference, read-only) and reports max deviations.
These are pure-function comparisons — losses, stencils, schedules — so
agreement is bitwise-level (f32 rounding) and proves the physics-loss
landscape matches.

Usage:  python tools/parity_audit.py          (requires /root/reference)
Output recorded in docs/PARITY.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = os.environ.get("REFERENCE_DIR", "/root/reference")


def main():
    if not os.path.isdir(REFERENCE):
        print(f"reference not found at {REFERENCE}; skipping audit")
        return 0
    sys.path.insert(0, REFERENCE)

    import numpy as np
    import torch
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from utils.image_gradient import SobelFilter as TorchSobel
    from models import darcy as tdarcy
    from utils.practices import OneCycleScheduler as TorchOneCycle

    from pde_surrogate_tpu.ops.filters import SobelFilter
    from pde_surrogate_tpu.ops import darcy as jdarcy
    from pde_surrogate_tpu.train.schedules import one_cycle

    rng = np.random.default_rng(0)
    results = []

    def record(name, ours, theirs):
        ours, theirs = np.asarray(ours), np.asarray(theirs)
        denom = max(np.abs(theirs).max(), 1e-12)
        rel = np.abs(ours - theirs).max() / denom
        results.append((name, rel))
        print(f"{name:55s} max rel dev = {rel:.3e}")

    # --- Sobel gradients ---------------------------------------------------
    for n in (32, 64, 65):
        img = rng.standard_normal((n, n)).astype(np.float32)
        tsob = TorchSobel(n, correct=True)
        jsob = SobelFilter(n, correct=True)
        timg = torch.from_numpy(img)[None, None]
        for fs in (3, 5):
            record(f"sobel grad_h n={n} fs={fs}",
                   jsob.grad_h(jnp.asarray(img), fs),
                   tsob.grad_h(timg, fs).numpy()[0, 0])
            record(f"sobel grad_v n={n} fs={fs}",
                   jsob.grad_v(jnp.asarray(img), fs),
                   tsob.grad_v(timg, fs).numpy()[0, 0])

    # --- conv losses ---------------------------------------------------------
    n, b = 64, 4
    k_np = np.exp(rng.standard_normal((b, 1, n, n))).astype(np.float32)
    out_np = rng.standard_normal((b, 3, n, n)).astype(np.float32)
    tk, tout = torch.from_numpy(k_np), torch.from_numpy(out_np)
    jk = jnp.asarray(np.moveaxis(k_np, 1, -1))
    jout = jnp.asarray(np.moveaxis(out_np, 1, -1))
    tsob, jsob = TorchSobel(n, correct=True), SobelFilter(n)

    record("conv_constitutive_constraint",
           jdarcy.conv_constitutive_constraint(jk, jout, jsob),
           tdarcy.conv_constitutive_constraint(tk, tout, tsob).numpy())
    record("conv_continuity_constraint",
           jdarcy.conv_continuity_constraint(jout, jsob),
           tdarcy.conv_continuity_constraint(tout, tsob).numpy())
    record("conv_continuity_constraint(use_tb=False)",
           jdarcy.conv_continuity_constraint(jout, jsob, use_tb=False),
           tdarcy.conv_continuity_constraint(tout, tsob, use_tb=False).numpy())
    td, tn = tdarcy.conv_boundary_condition(tout)
    jd, jn = jdarcy.conv_boundary_condition(jout)
    record("conv_boundary_condition dirichlet", jd, td.numpy())
    record("conv_boundary_condition neumann", jn, tn.numpy())
    record("conv_constitutive_nonlinear(b1=0.3,b2=0.7)",
           jdarcy.conv_constitutive_constraint_nonlinear(jk, jout, jsob, 0.3, 0.7),
           tdarcy.conv_constitutive_constraint_nonlinear(
               tk, tout, tsob, 0.3, 0.7).numpy())
    record("energy_functional_exp",
           jdarcy.energy_functional_exp(jk, jout[..., 0:1], jsob),
           tdarcy.energy_functional_exp(tk, tout[:, 0:1], tsob).numpy())

    # --- FC-family losses on identical linear nets --------------------------
    w1 = rng.standard_normal((2, 8)).astype(np.float32)
    w2 = rng.standard_normal((8, 3)).astype(np.float32)

    def jnet(params, pts):
        return jnp.tanh(pts @ jnp.asarray(w1)) @ jnp.asarray(w2)

    class TNet(torch.nn.Module):
        def forward(self, pts):
            return torch.tanh(pts @ torch.from_numpy(w1)) @ torch.from_numpy(w2)

    pts_np = rng.random((50, 2)).astype(np.float32)
    kc_np = np.exp(rng.standard_normal((50, 1))).astype(np.float32)
    tpts = torch.from_numpy(pts_np.copy())
    record("mixed_residual_fc (on-grid)",
           jdarcy.mixed_residual_fc(jnet, None, jnp.asarray(pts_np),
                                    jnp.asarray(kc_np)),
           tdarcy.mixed_residual_fc(TNet(), tpts,
                                    torch.from_numpy(kc_np)).detach().numpy())
    tpts2 = torch.from_numpy(pts_np.copy())
    record("neumann_boundary_mixed",
           jdarcy.neumann_boundary_mixed(jnet, None, jnp.asarray(pts_np)),
           tdarcy.neumann_boundary_mixed(TNet(), tpts2).detach().numpy())

    # --- OneCycle schedule ---------------------------------------------------
    tsched = TorchOneCycle(lr_max=1e-3, div_factor=2.0, pct_start=0.3)
    jsched = one_cycle(1e-3, div_factor=2.0, pct_start=0.3)
    pcts = np.linspace(0, 1, 41)
    record("one_cycle schedule",
           np.array([float(jsched(p)) for p in pcts]),
           np.array([tsched.step(p) for p in pcts]))

    worst = max(r for _, r in results)
    print(f"\n{len(results)} comparisons, worst max-rel deviation: {worst:.3e}")
    return 0 if worst < 5e-5 else 1


if __name__ == "__main__":
    sys.exit(main())
