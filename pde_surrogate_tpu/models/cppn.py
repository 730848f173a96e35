"""Compositional pattern-producing networks (PINN-style solver nets).

Flax re-design of the reference's CPPN / ResCPPN (models/cppn.py:11-106):
an MLP mapping spatial coordinates (y, x) in [0,1]^2 to the solution fields
(u, tau_ver, tau_hor).  Hidden width 512 keeps the matmuls MXU-friendly even
for thousands of collocation points in one batched evaluation.

Init parity: Xavier-normal on every >=2-D parameter (models/cppn.py:40-43);
the first layer has no bias (models/cppn.py:18).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CPPN", "ResCPPN", "fc_model_size"]


def fc_model_size(params) -> tuple[int, int]:
    """(n_params, n_fc_layers) — parity with models/cppn.py:45-51."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    n_params, n_fc = 0, 0
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        if "fc" in name:
            n_fc += 1
        n_params += int(np.prod(leaf.shape))
    return n_params, n_fc


def _act(name: str):
    if name == "tanh":
        return jnp.tanh
    if name == "relu":
        return nn.relu
    raise ValueError(f"unknown activation function: {name}")


class CPPN(nn.Module):
    """(N, dim_in) coords -> (N, dim_out) fields (models/cppn.py:11-51)."""
    dim_in: int = 2
    dim_out: int = 3
    dim_hidden: int = 512
    layers_hidden: int = 8
    act: str = "tanh"

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.xavier_normal()
        act = _act(self.act)
        x = jnp.tanh(nn.Dense(self.dim_hidden, use_bias=False,
                              kernel_init=init, name="fc0")(x))
        for i in range(1, self.layers_hidden):
            x = act(nn.Dense(self.dim_hidden, kernel_init=init,
                             name=f"fc{i}")(x))
        return nn.Dense(self.dim_out, kernel_init=init,
                        name=f"fc{self.layers_hidden}")(x)


class ResLayer(nn.Module):
    """Pre-activation residual FC block (models/cppn.py:70-85)."""
    dim_hidden: int
    act: str = "tanh"

    @nn.compact
    def __call__(self, x):
        act = _act(self.act)
        init = nn.initializers.xavier_normal()
        out = nn.Dense(self.dim_hidden, kernel_init=init, name="fc1")(act(x))
        out = nn.Dense(x.shape[-1], kernel_init=init, name="fc2")(act(out))
        return x + out


class ResCPPN(nn.Module):
    """Residual CPPN variant (models/cppn.py:87-106)."""
    dim_in: int = 2
    dim_out: int = 1
    dim_hidden: int = 64
    res_layers: int = 3
    act: str = "tanh"

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.xavier_normal()
        x = nn.Dense(self.dim_hidden, use_bias=False, kernel_init=init,
                     name="fc0")(x)
        for i in range(self.res_layers):
            x = ResLayer(self.dim_hidden, self.act, name=f"reslayer{i + 1}")(x)
        x = _act(self.act)(x)
        return nn.Dense(self.dim_out, kernel_init=init, name="fc_last")(x)
