"""Torch-checkpoint importer end-to-end validation (VERDICT r2 item 7).

Train the *reference* driver for a few epochs on this repo's datasets
(tools/run: see logs/torch_tiny_for_import.log), then import its .pth with
utils/torch_import and evaluate the flax model on the SAME test split with
the reference metric formulas (train_codec_mixed_residual.py:167-200).
Pass = imported weights reproduce the torch run's final-epoch test
relative-L2 / R^2 within float tolerance.

Run:  python tools/importer_e2e_probe.py --ckpt <model_epochN.pth> \
          [--ntest 64] [--log logs/torch_tiny_for_import.log]
"""

import argparse
import re
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from pde_surrogate_tpu.data.hdf5 import load_data
from pde_surrogate_tpu.models.codec import DenseED
from pde_surrogate_tpu.utils.torch_import import (convert_codec_state_dict,
                                                  check_tree_match,
                                                  load_state_dict)

parser = argparse.ArgumentParser()
parser.add_argument("--ckpt", type=str, required=True)
parser.add_argument("--test-file", type=str,
                    default="datasets/64x64/kle512_lhs1000_val.hdf5")
parser.add_argument("--ntest", type=int, default=64)
parser.add_argument("--imsize", type=int, default=64)
parser.add_argument("--log", type=str, default=None,
                    help="torch training log to diff the final metrics against")
args = parser.parse_args()

params, batch_stats = convert_codec_state_dict(load_state_dict(args.ckpt))

model = DenseED(1, 3, imsize=args.imsize, blocks=[6, 8, 6], growth_rate=16,
                init_features=48)
template = model.init(jax.random.key(0),
                      np.zeros((1, args.imsize, args.imsize, 1), np.float32),
                      train=False)
assert check_tree_match(params, template["params"]) == []
assert check_tree_match(batch_stats, template["batch_stats"]) == []

x, y, stats = load_data(args.test_file, args.ntest, only_input=False,
                        return_stats=True)
out = model.apply({"params": params, "batch_stats": batch_stats},
                  x, train=False)
out = np.asarray(out)

# reference metric formulas (train_codec_mixed_residual.py:180-182,196-197):
# rel-L2 per channel averaged over the test set; R^2 = 1 - SSE/y_variation
err2 = ((out - y) ** 2).sum(axis=(1, 2))          # (B, C)
rel_l2 = np.sqrt(err2 / (y ** 2).sum(axis=(1, 2))).mean(0)
r2 = 1.0 - err2.sum(0) / stats["y_variation"]
print(f"[import-e2e] flax eval of imported ckpt ({args.ntest} test):")
print(f"  relative-l2: {rel_l2}")
print(f"  r2-score:    {r2}")

if args.log:
    txt = open(args.log).read()
    r2_lines = re.findall(r"test r2-score:\s+\[([^\]]+)\]", txt)
    l2_lines = re.findall(r"test relative-l2:\s+\[([^\]]+)\]", txt)
    t_r2 = np.fromstring(r2_lines[-1], sep=" ")
    t_l2 = np.fromstring(l2_lines[-1], sep=" ")
    print(f"[import-e2e] torch final-epoch metrics from {args.log}:")
    print(f"  relative-l2: {t_l2}")
    print(f"  r2-score:    {t_r2}")
    d_l2 = np.abs(rel_l2 - t_l2).max()
    d_r2 = np.abs(r2 - t_r2).max()
    print(f"[import-e2e] max |delta| rel-l2 {d_l2:.2e}  r2 {d_r2:.2e}")
    assert d_l2 < 5e-4 and d_r2 < 5e-3, "imported weights diverge from torch"
    print("[import-e2e] PASS: imported weights reproduce the torch metrics")
