"""HLO-level scaling analysis of the row-sharded two-view engine.

Thin driver around stereoreconstruction_tpu/parallel/scaling.py (which
tests/test_scaling_floor.py also asserts against): compiles the SPMD
module at 1/2/4/8 devices for BOTH production methods and writes
SCALING.json + a markdown table for BASELINE.md.

This is a FLOPs *model*, not a measurement (see scaling.py docstring):
per-device FLOPs from XLA cost analysis (+ an analytic kernel model for
the Pallas custom call), with collective bytes shown to evidence the
O(1)-in-devices communication.  Run with
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

n_dev_wanted = 8
os.environ.setdefault(
    "XLA_FLAGS", f"--xla_force_host_platform_device_count={n_dev_wanted}")

import jax
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

from stereoreconstruction_tpu.parallel.scaling import (
    analyze_rowshard_scaling)

# Bench-like shape (bunny at scale 0.5); depth count reduced 100 -> 25 to
# keep CPU compile times sane — per-depth work is constant, so efficiency
# ratios are unchanged.
H, W, D = 384, 512, 25


def main():
    out = {
        "what": "HLO cost-analysis scaling MODEL of parallel/rowshard.py "
                f"two-view at {H}x{W}, {D} depths (bench shape, depth "
                "count scaled down for CPU compile time).  Pallas rows "
                "add an analytic kernel FLOP model (the fused custom "
                "call is invisible to XLA cost analysis); collective "
                "latency/serialization are unmodeled.",
        "methods": {},
    }
    for method in ("pallas", "fast"):
        print(f"== method={method}", flush=True)
        rows = analyze_rowshard_scaling(H, W, D, (1, 2, 4, 8),
                                        method=method)
        out["methods"][method] = rows
        print("\n| devices (row axis) | per-device GFLOPs | efficiency "
              "| w/ comm model | collective bytes/device |")
        print("|---|---|---|---|---|")
        for r in rows:
            comm = sum(r["collective_bytes_per_device"].values())
            print(f"| {r['n_row']} | {r['per_device_flops']/1e9:.2f} "
                  f"| {r['efficiency']*100:.1f}% "
                  f"| {r['efficiency_with_comm']*100:.1f}% | {comm:,} |")

    with open(os.path.join(os.path.dirname(__file__), "..",
                           "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
