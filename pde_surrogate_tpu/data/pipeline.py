"""Device-resident input pipeline.

The datasets are small (<= 10k images of 64 x 64), so the pipeline keeps the
whole dataset on device and materializes epochs as gathers driven by a PRNG
key: permutation -> reshape to (steps, batch) -> index.  There is no
host-side loop or per-batch transfer (the reference pays a host->device copy
per batch, train_codec_mixed_residual.py:225).

Shuffling is a pure function of (key, epoch), so dataloader state never
needs checkpointing: resuming at epoch e reproduces the exact stream —
deterministic-resume semantics (SURVEY.md section 5, failure recovery).

With a data mesh axis, batches are sharded across devices by NamedSharding;
the gather happens on device and XLA keeps each shard local.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DeviceDataset"]


class DeviceDataset:
    """Epoch-shuffled batches of device-resident tensors.

    Args:
      arrays: one or more equal-length numpy/jax arrays (e.g. x, or (x, y)).
      batch_size: drop-last batching (reference DataLoader semantics,
        utils/load.py:34-35).
      key: base PRNG key; epoch streams derive from ``fold_in(key, epoch)``.
      sharding: optional `jax.sharding.NamedSharding` for the batch dim.
    """

    def __init__(self, *arrays, batch_size: int, key: jax.Array | int = 0,
                 sharding=None, shuffle: bool = True):
        lengths = {len(a) for a in arrays}
        if len(lengths) != 1:
            raise ValueError(f"array length mismatch: {lengths}")
        self.n = lengths.pop()
        self.batch_size = int(batch_size)
        self.steps_per_epoch = self.n // self.batch_size
        if self.steps_per_epoch == 0:
            raise ValueError("batch_size larger than dataset")
        self.key = jax.random.key(key) if isinstance(key, int) else key
        self.shuffle = shuffle
        self.sharding = sharding
        self.arrays = tuple(
            jax.device_put(jnp.asarray(a), self._array_sharding(a))
            for a in arrays)

    def _array_sharding(self, a):
        if self.sharding is None:
            return None
        # dataset replicated; per-batch gathers get resharded below
        return jax.sharding.NamedSharding(self.sharding.mesh,
                                          jax.sharding.PartitionSpec())

    def epoch_indices(self, epoch: int) -> jax.Array:
        """(steps, batch_size) gather indices for this epoch (pure in epoch)."""
        if self.shuffle:
            perm = jax.random.permutation(
                jax.random.fold_in(self.key, epoch), self.n)
        else:
            perm = jnp.arange(self.n)
        usable = self.steps_per_epoch * self.batch_size
        return perm[:usable].reshape(self.steps_per_epoch, self.batch_size)

    def batches(self, epoch: int) -> Iterator[tuple]:
        """Iterate (arrays...) batches for one epoch."""
        idx = self.epoch_indices(epoch)
        for s in range(self.steps_per_epoch):
            batch = tuple(a[idx[s]] for a in self.arrays)
            if self.sharding is not None:
                batch = tuple(jax.device_put(b, self.sharding) for b in batch)
            yield batch

    def __len__(self) -> int:
        return self.steps_per_epoch
