"""Model shape/parameter summaries.

The reference debugs layer shapes with ``forward_test`` methods that
forward an input and print every module's output size
(models/codec.py:298-303, 365-370; models/cppn.py:33-38).  The flax-idiom
equivalent is ``nn.tabulate``; ``summarize`` wraps it with the same
purpose: a one-call per-module shape/param table.
"""

from __future__ import annotations

import flax.linen as nn
import jax

__all__ = ["summarize"]


def summarize(model: nn.Module, *example_args, depth: int = 2,
              **example_kwargs) -> str:
    """Return (and print) a per-module table of output shapes and params."""
    table = nn.tabulate(
        model, jax.random.key(0), depth=depth,
        compute_flops=False, compute_vjp_flops=False,
    )(*example_args, **example_kwargs)
    print(table)
    return table
