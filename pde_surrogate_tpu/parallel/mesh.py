"""Device mesh construction and sharding policies.

The reference is single-device (``--cuda n``, no torch.distributed anywhere
— SURVEY.md section 2).  Here data parallelism is first-class: a 1-D
``('data',)`` mesh over all local devices, parameters replicated, batches
sharded on the leading axis.  Gradient all-reduce is inserted by XLA inside
jit and rides ICI; nothing in the train step mentions collectives.

The same helpers back the multi-chip dry-run (`__graft_entry__.py`) and the
CPU fake-device tests (conftest forces 8 host devices).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["data_mesh", "batch_sharding", "replicated", "shard_batch",
           "replicate", "dp_sp_mesh", "batch_space_sharding"]


def data_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def dp_sp_mesh(n_data: int, n_space: int,
               axes: tuple[str, str] = ("data", "space")) -> Mesh:
    """2-D (data x space) mesh for grids too large for one chip.

    Training batches shard on ``data`` AND their height dimension on
    ``space`` (`batch_space_sharding`); XLA's SPMD partitioner inserts the
    conv halo exchanges and the cross-device BatchNorm reductions — the
    step function itself never mentions a collective. This is the
    activation-memory scaling path for large imsize, complementing the
    shard_map FV solver in `parallel/spatial.py`.
    """
    devices = jax.devices()[: n_data * n_space]
    if len(devices) < n_data * n_space:
        raise ValueError(f"need {n_data * n_space} devices, "
                         f"have {len(jax.devices())}")
    import numpy as _np
    return Mesh(_np.asarray(devices).reshape(n_data, n_space), axes)


def batch_space_sharding(mesh: Mesh,
                         axes: tuple[str, str] = ("data", "space")
                         ) -> NamedSharding:
    """(N, H, W, C) arrays: batch on the data axis, height on space."""
    return NamedSharding(mesh, P(axes[0], axes[1]))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a batch pytree with its leading dim sharded over the mesh."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), batch)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)
