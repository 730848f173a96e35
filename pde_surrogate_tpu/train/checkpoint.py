"""Pytree checkpointing with the reference's run-directory layout.

The reference stores ``run_dir/checkpoints/model_epoch{N}.pth``
(train_codec_mixed_residual.py:249-250) and, for the flow, full
``{epoch, model, optimizer, logger}`` dicts (train_cglow_reverse_kl.py:281-289).

Here a checkpoint is two files per epoch:
  * ``model_epoch{N}.msgpack`` — the array pytree (params, batch_stats,
    opt_state, PRNG keys), restored against a like-structured template so
    shapes/dtypes are exact;
  * ``model_epoch{N}.json``    — variable-size metadata (epoch, logger
    metric lists), which JSON round-trips without structural templates.

Writes are atomic (tmp + rename): a preempted job never leaves a torn
checkpoint, which is the failure-recovery story the reference's unstable
reverse-KL training motivates (README.md:84-85, --resume flag).
"""

from __future__ import annotations

import json
import math
import os
import re

import flax.serialization
import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_epoch",
           "latest_meta_epoch", "select_consistency_epoch",
           "checkpoint_file"]


def checkpoint_file(ckpt_dir: str, epoch: int) -> str:
    return os.path.join(ckpt_dir, f"model_epoch{epoch}.msgpack")


def _meta_file(ckpt_dir: str, epoch: int) -> str:
    return os.path.join(ckpt_dir, f"model_epoch{epoch}.json")


def _atomic_write(path: str, data: bytes | str):
    mode = "wb" if isinstance(data, bytes) else "w"
    tmp = path + ".tmp"
    with open(tmp, mode) as f:
        f.write(data)
    os.replace(tmp, path)


def _is_prng_key(leaf) -> bool:
    return isinstance(leaf, jax.Array) and jax.dtypes.issubdtype(
        leaf.dtype, jax.dtypes.prng_key)


def _unwrap_keys(tree):
    """Typed PRNG keys -> raw uint32 data (msgpack-serializable)."""
    return jax.tree_util.tree_map(
        lambda l: jax.random.key_data(l) if _is_prng_key(l) else l, tree)


def _rewrap_keys(restored, template):
    """Re-wrap leaves that are PRNG keys in the template."""
    return jax.tree_util.tree_map(
        lambda r, t: jax.random.wrap_key_data(r) if _is_prng_key(t) else r,
        restored, template)


def save_checkpoint(ckpt_dir: str, epoch: int, state, meta: dict | None = None
                    ) -> str:
    """Serialize array pytree ``state`` (+ JSON-able ``meta``)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    state = jax.device_get(_unwrap_keys(state))
    path = checkpoint_file(ckpt_dir, epoch)
    _atomic_write(path, flax.serialization.to_bytes(state))
    if meta is not None:
        _atomic_write(_meta_file(ckpt_dir, epoch), json.dumps(meta, indent=2))
    return path


def restore_checkpoint(ckpt_dir: str, epoch: int, template,
                       with_meta: bool = False):
    """Restore the array pytree into ``template``'s structure.

    With ``with_meta`` returns ``(state, meta_dict)`` (meta ``{}`` if the
    sidecar is absent).
    """
    with open(checkpoint_file(ckpt_dir, epoch), "rb") as f:
        state = flax.serialization.from_bytes(_unwrap_keys(template), f.read())
    state = _rewrap_keys(state, template)
    if not with_meta:
        return state
    meta_path = _meta_file(ckpt_dir, epoch)
    meta = {}
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def latest_epoch(ckpt_dir: str) -> int | None:
    """Largest epoch with a checkpoint file, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    epochs = [int(m.group(1)) for fn in os.listdir(ckpt_dir)
              if (m := re.fullmatch(r"model_epoch(\d+)\.msgpack", fn))]
    return max(epochs) if epochs else None


def latest_meta_epoch(ckpt_dir: str, at_or_below: int | None = None
                      ) -> int | None:
    """Largest epoch with a meta sidecar (optionally capped), or None.

    A kill between the two atomic writes in save_checkpoint can leave the
    newest .msgpack without its .json; history readers fall back to the
    newest sidecar that exists (its ckpt_consistency list is a prefix of
    the lost one).
    """
    if not os.path.isdir(ckpt_dir):
        return None
    epochs = [int(m.group(1)) for fn in os.listdir(ckpt_dir)
              if (m := re.fullmatch(r"model_epoch(\d+)\.json", fn))]
    if at_or_below is not None:
        epochs = [e for e in epochs if e <= at_or_below]
    return max(epochs) if epochs else None


def select_consistency_epoch(history) -> tuple[int, float] | None:
    """Argmin over finite ``(epoch, consistency)`` records, or None.

    The label-free checkpoint-selection rule (docs/RESULTS.md): the lowest
    flux-pressure consistency separates u-drifted checkpoints (0.2-0.9)
    from clean ones (0.05-0.12) without labels.
    """
    finite = [(int(e), float(c)) for e, c in history if math.isfinite(c)]
    return min(finite, key=lambda t: t[1]) if finite else None
