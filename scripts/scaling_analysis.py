"""HLO-level scaling analysis of the row-sharded two-view engine.

Wall-clock on a virtual CPU mesh is meaningless for efficiency (all devices
share the same cores), so this measures what actually determines multi-chip
scaling on TPU:

* per-device FLOPs at each device count (XLA cost analysis of the compiled
  SPMD module) -> parallel efficiency = flops(1) / (n * flops(n)); the
  overhead is the halo-overlap recompute,
* the collective communication volume per device (bytes moved by
  all-gather/etc. in the compiled module) vs the FLOPs they overlap with.

Writes SCALING.json at the repo root and prints a markdown table for
BASELINE.md.  Run with
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
"""

import json
import os
import re
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

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stereoreconstruction_tpu.config import TwoViewConfig
from stereoreconstruction_tpu.parallel import rowshard


# Bench-like shape (bunny at scale 0.5); depth count reduced 100 -> 25 to
# keep CPU compile times sane — per-depth work is constant, so efficiency
# ratios are unchanged.
H, W, D = 384, 512, 25


def collective_bytes(hlo_text: str) -> dict:
    """Total bytes produced by collective ops in an HLO module text."""
    sizes = {"all-gather": 0, "all-reduce": 0, "collective-permute": 0,
             "all-to-all": 0, "reduce-scatter": 0}
    dtype_bytes = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                   "u32": 4, "pred": 1, "u8": 1, "s8": 1}
    for kind in sizes:
        for m in re.finditer(
                rf"= (\w+)\[([\d,]*)\][^=]*{kind}\(", hlo_text):
            dt, dims = m.group(1), m.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            sizes[kind] += n * dtype_bytes.get(dt, 4)
    return {k: v for k, v in sizes.items() if v}


def analyze(n_row: int):
    mesh = rowshard.make_mesh(1, n_row)
    halo = 6  # window_radius 5 + 1
    cfg = TwoViewConfig(min_depth=30.0, max_depth=80.0,
                        num_depth_levels=D, image_scale=0.5)
    tile = -(-H // n_row)
    bh = tile + 2 * halo

    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    mask = np.ones((1, H, W), bool)

    from stereoreconstruction_tpu.geometry import make_camera
    K = np.array([[900.0, 0, W], [0, 900.0, H], [0, 0, 1]])
    th = 0.2
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    cam_l = make_camera(K, np.eye(3), np.zeros(3))
    cam_r = make_camera(K, R, np.array([-30.0, 0.0, 3.0]))
    cams_l = rowshard.stack_cameras([cam_l])
    cams_r = rowshard.stack_cameras([cam_r])

    dl, dr, compiled = rowshard.twoview_pairs_rowsharded(
        mesh, rgb, mask, rgb, mask, cams_l, cams_r, cfg,
        cross_check=True, enable_refraction=False,
        enable_distortion=True, return_compiled=True)
    jax.block_until_ready((dl, dr))
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    comm = collective_bytes(compiled.as_text())
    return {
        "n_row": n_row,
        "tile_rows": tile,
        "block_rows": bh,
        "per_device_flops": flops,
        "halo_overhead_model": bh / tile,
        "collective_bytes_per_device": comm,
    }


def main():
    rows = []
    for n_row in (1, 2, 4, 8):
        if n_row > len(jax.devices()):
            break
        r = analyze(n_row)
        rows.append(r)
        print(f"n={n_row}: per-device GFLOPs="
              f"{r['per_device_flops']/1e9:.2f} "
              f"halo-model x{r['halo_overhead_model']:.3f} "
              f"comm={r['collective_bytes_per_device']}", flush=True)

    base = rows[0]["per_device_flops"]
    for r in rows:
        r["efficiency"] = base / (r["n_row"] * r["per_device_flops"])

    out = {
        "what": "HLO cost-analysis scaling of parallel/rowshard.py "
                f"two-view at {H}x{W}, {D} depths (bench shape, "
                "depth count scaled down for CPU compile time)",
        "rows": rows,
    }
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)

    print("\n| devices (row axis) | per-device GFLOPs | efficiency "
          "| collective bytes/device |")
    print("|---|---|---|---|")
    for r in rows:
        comm = sum(r["collective_bytes_per_device"].values())
        print(f"| {r['n_row']} | {r['per_device_flops']/1e9:.2f} "
              f"| {r['efficiency']*100:.1f}% | {comm:,} |")


if __name__ == "__main__":
    main()
