"""Import reference PyTorch checkpoints (.pth) into this framework.

The reference workflow downloads pretrained checkpoints and post-processes
them (/root/reference/scripts/download_checkpoints.sh,
/root/reference/post_cglow.py:54-61).  This module maps a reference
``state_dict`` onto this framework's flax param/batch_stats pytrees so those
published weights (or any locally-trained reference run) can be evaluated
and served through the TPU-native pipeline.

Name mapping (reference models/codec.py:210-370):
  ``features.In_conv.weight``                  -> params/in_conv/kernel
  ``features.EncBlock1.denselayer2.conv1.weight``
        -> params/encblock1/denselayer2/conv1/kernel
  ``features.TransDown1.norm1.{weight,bias}``  -> .../norm1/{scale,bias}
  ``features.*.norm*.running_{mean,var}``      -> batch_stats/.../{mean,var}
  ``features.LastTransUp.conv3.weight``        -> lasttransup/conv3/kernel

Array layout: torch Conv2d weight (O, I, kH, kW) -> flax kernel
(kH, kW, I, O); ConvTranspose2d weight (I, O, kH, kW) -> flax ConvTranspose
kernel (kH, kW, I, O) with the spatial taps flipped (torch's transposed conv
is the adjoint of a correlation; flax's ``ConvTranspose`` applies the kernel
in forward orientation — verified numerically in tests/test_torch_import.py).

No reference code is imported here; only tensor names/layouts are mapped.
"""

from __future__ import annotations

import numpy as np

__all__ = ["convert_codec_state_dict", "convert_glow_state_dict",
           "load_state_dict"]


def load_state_dict(pth_path: str) -> dict:
    """Load a torch ``.pth`` into a flat {name: np.ndarray} dict.

    Accepts bare ``state_dict`` saves (codec drivers,
    train_codec_mixed_residual.py:249-250) and full training dicts with a
    ``model_state_dict`` entry — the cGlow driver's actual key
    (train_cglow_reverse_kl.py:282-286) — or a ``model`` entry.
    """
    import torch

    obj = torch.load(pth_path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and not any(
            hasattr(v, "numpy") for v in obj.values()):
        for key in ("model_state_dict", "model"):
            if key in obj:
                obj = obj[key]
                break
    return {k: np.asarray(v.detach().numpy()) for k, v in obj.items()}


def _nest(tree: dict, path: list[str], leaf: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def convert_codec_state_dict(sd: dict) -> tuple[dict, dict]:
    """Reference DenseED/Decoder ``state_dict`` -> (params, batch_stats).

    Works for any reference codec topology (DenseED, Decoder) because the
    mapping is purely mechanical: module names lowercase 1:1, conv weights
    transpose to NHWC-kernel layout, batch-norm running stats split into the
    ``batch_stats`` collection.
    """
    params: dict = {}
    batch_stats: dict = {}
    for name, value in sd.items():
        parts = name.split(".")
        if parts[0] == "features":
            parts = parts[1:]
        *modules, leaf = parts
        # Flax module names are the reference names lowercased, EXCEPT the
        # transpose convs which keep their 'convT{n}' camel-case on both sides
        # (reference models/codec.py:140,156 <-> models/codec.py::Transition).
        modules = [m if m.startswith("convT") else m.lower() for m in modules]
        last_mod = modules[-1] if modules else ""
        if leaf == "num_batches_tracked":
            continue
        if leaf == "running_mean":
            _nest(batch_stats, modules + ["mean"], value)
        elif leaf == "running_var":
            _nest(batch_stats, modules + ["var"], value)
        elif leaf == "weight" and value.ndim == 4:
            if last_mod.lower().startswith("convt"):
                # torch ConvTranspose2d (I, O, kH, kW): adjoint correlation ==
                # forward conv with spatially flipped taps
                kernel = value[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            else:
                kernel = value.transpose(2, 3, 1, 0)
            _nest(params, modules + ["kernel"], np.ascontiguousarray(kernel))
        elif leaf == "weight" and value.ndim == 1:  # BatchNorm affine
            _nest(params, modules + ["scale"], value)
        elif leaf == "bias":
            _nest(params, modules + ["bias"], value)
        else:
            raise ValueError(f"unrecognized state_dict entry: {name} "
                             f"(shape {value.shape})")
    return params, batch_stats


def convert_glow_state_dict(sd: dict) -> tuple[dict, dict, dict]:
    """Reference MultiScaleCondGlow ``state_dict`` -> (params, batch_stats,
    constants).

    Name surgery vs the flax tree (reference models/glow_msc.py:672-748):
      - the ``flow.`` Sequential prefix and the ``revlayers.`` /
        ``reduce.`` container levels don't exist in the flax module tree;
      - ActNorm (C,1,1) weight/bias flatten to (C,) (glow_msc.py:65-66);
      - Conv2dZeros ``scale`` (1,C,1,1) flattens to (C,) (glow_msc.py:251);
      - InvertibleConv1x1LU: ``l``/``u``/``log_s`` are params, ``p``/
        ``sign_s`` land in the 'constants' collection; the ``l_mask``/
        ``u_mask``/``eye`` buffers are derived on the fly here and skipped
        (glow_msc.py:193-200 <-> models/flow.py::InvConv1x1LU).

    The evaluating model must be built with ``squeeze_order='reference'``:
    reference convs were trained on its quadrant-tile squeeze encoding
    (glow_msc.py:415-421), not this framework's native subpixel order.
    """
    params: dict = {}
    batch_stats: dict = {}
    constants: dict = {}
    skip = {"num_batches_tracked", "l_mask", "u_mask", "eye"}
    for name, value in sd.items():
        parts = [p for p in name.split(".")
                 if p not in ("flow", "revlayers", "reduce")]
        *modules, leaf = parts
        if leaf in skip:
            continue
        if leaf == "running_mean":
            _nest(batch_stats, modules + ["mean"], value)
        elif leaf == "running_var":
            _nest(batch_stats, modules + ["var"], value)
        elif leaf in ("p", "sign_s"):
            _nest(constants, modules + [leaf], value)
        elif leaf in ("l", "u", "log_s"):
            _nest(params, modules + [leaf], value)
        elif leaf == "scale":  # Conv2dZeros channel scale (1, C, 1, 1)
            _nest(params, modules + ["scale"], value.reshape(-1))
        elif leaf == "weight" and value.ndim == 4:  # conv (O, I, kH, kW)
            _nest(params, modules + ["kernel"],
                  np.ascontiguousarray(value.transpose(2, 3, 1, 0)))
        elif leaf == "weight" and value.ndim == 3:  # ActNorm (C, 1, 1)
            _nest(params, modules + ["weight"], value.reshape(-1))
        elif leaf == "weight" and value.ndim == 2:  # non-LU InvConv (C, C)
            _nest(params, modules + ["weight"], value)
        elif leaf == "weight" and value.ndim == 1:  # BatchNorm affine
            _nest(params, modules + ["scale"], value)
        elif leaf == "bias":
            bias = value.reshape(-1) if value.ndim == 3 else value
            _nest(params, modules + ["bias"], bias)
        else:
            raise ValueError(f"unrecognized state_dict entry: {name} "
                             f"(shape {value.shape})")
    return params, batch_stats, constants


def check_tree_match(imported: dict, template) -> list[str]:
    """Paths present in exactly one of (imported, template) — [] == exact."""
    def flatten(t, prefix=""):
        out = {}
        items = t.items() if hasattr(t, "items") else []
        for k, v in items:
            p = f"{prefix}/{k}"
            if hasattr(v, "items"):
                out.update(flatten(v, p))
            else:
                out[p] = tuple(np.shape(v))
        return out

    a, b = flatten(imported), flatten(template)
    problems = [f"imported-only: {k} {a[k]}" for k in sorted(set(a) - set(b))]
    problems += [f"missing: {k} {b[k]}" for k in sorted(set(b) - set(a))]
    problems += [f"shape mismatch at {k}: {a[k]} vs {b[k]}"
                 for k in sorted(set(a) & set(b)) if a[k] != b[k]]
    return problems
