"""Per-op device-time shares from a jax.profiler chrome trace.

The tensorboard_plugin_profile xplane converters are broken on this image
(protobuf/pywrap API mismatches), but the trace directory also contains a
chrome-format ``vm.trace.json.gz`` whose ``/device:TPU:0 / XLA Ops`` lane
(pid 3 / tid 3 in this runtime) has one X event per executed HLO op.
Aggregating durations by op family is the honest "where do the
milliseconds go" table (e.g. the DenseED step: 68% conv fusions, 24%
concatenate+copy — the concat-topology tax — 4% BN-stats reductions;
logs/hbm_probe_r3.log).

Usage:  python tools/trace_op_shares.py TRACE_DIR [n_steps]
"""
import collections
import glob
import gzip
import json
import re
import sys


def op_shares(trace_dir: str, n_steps: int = 1):
    paths = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no chrome trace under {trace_dir}")
    tr = json.load(gzip.open(paths[-1]))
    ev = tr["traceEvents"] if isinstance(tr, dict) else tr
    # locate the XLA Ops lane: thread named "XLA Ops" of a /device:* process
    lanes = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
    ops_lane = {k for k, v in lanes.items() if v == "XLA Ops"}
    by = collections.defaultdict(float)
    total = 0.0
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and (e.get("pid"), e.get("tid")) in ops_lane):
            base = re.sub(r"[.\d]+$", "", e["name"])
            by[base] += e["dur"]
            total += e["dur"]
    return by, total


def main():
    trace_dir = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    by, total = op_shares(trace_dir, n_steps)
    print(f"[ops] {total / 1e3:.2f} ms device time over {n_steps} steps "
          f"-> {total / n_steps / 1e3:.3f} ms/step")
    for name, d in sorted(by.items(), key=lambda kv: -kv[1]):
        if d / total < 0.001:
            continue
        print(f"[ops] {d / n_steps / 1e3:8.3f} ms/step  "
              f"{100 * d / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
