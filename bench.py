"""Benchmark: bunny two-view cost-volume throughput on TPU vs the
reference-style CPU baseline.

Config #1 of BASELINE.json: example-project bunny pair, README-equivalent
stereo settings (100 depth levels, image scale 0.5, geodesic weights,
radius-5 NCC, WTA + second-best rejection + cross-check).  Depth range
[30, 80] in the shipped calibration's units (the README's 300/800 applies to
re-calibrated mm units; the shipped projection matrices put the bunny at
~50 units — see BASELINE.md).

Baseline: the reference publishes no numbers, so per BASELINE.md the
baseline is our faithful C++/OpenMP re-implementation of the reference's
per-pixel loops (runtime/native/twoview_oracle.cpp), measured once on this
machine and cached in BASELINE_MEASURED.json.

Prints ONE JSON line:
  {"metric": ..., "value": views/s/chip, "unit": "views/s", "vs_baseline": x}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    import jax.numpy as jnp
    from stereoreconstruction_tpu.config import TwoViewConfig
    from stereoreconstruction_tpu.data.project_io import load_project
    from stereoreconstruction_tpu.data.images import load_image
    from stereoreconstruction_tpu.stereo.twoview import compute_depth_maps

    repo = os.path.dirname(os.path.abspath(__file__))
    proj = load_project("/root/reference/example/project.xml")
    bunny = proj.image_sets["bunny"]
    cfg = TwoViewConfig(min_depth=30.0, max_depth=80.0)

    cam_ids = ["7310085", "7310087"]
    cam_recs = [proj.cameras[c] for c in cam_ids]
    cams = [r.to_camera() for r in cam_recs]
    imgs = [load_image(bunny.default_image_for_camera(c).file,
                       cfg.image_scale) for c in cam_ids]
    log(f"devices: {jax.devices()}")
    log(f"image shape: {imgs[0].rgb.shape}")

    # ---- baseline (reference-style C++/OpenMP), measured once & cached ----
    baseline_path = os.path.join(repo, "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
    else:
        from stereoreconstruction_tpu.runtime.native import (
            twoview_depth_map_native, native_num_threads)
        log(f"measuring CPU baseline ({native_num_threads()} threads)...")
        t0 = time.time()
        d_base = twoview_depth_map_native(
            imgs[0].rgb, imgs[0].mask, imgs[1].rgb, imgs[1].mask,
            cams[0], cams[1], cfg)
        base_s = time.time() - t0
        baseline = {
            "what": "reference-style C++/OpenMP two-view depth map "
                    "(runtime/native/twoview_oracle.cpp), bunny pair, "
                    "one view",
            "seconds_per_view": base_s,
            "views_per_s": 1.0 / base_s,
            "threads": native_num_threads(),
            "finite_frac": float(np.isfinite(d_base).mean()),
        }
        with open(baseline_path, "w") as f:
            json.dump(baseline, f, indent=1)
        log(f"baseline: {base_s:.1f}s/view")

    # ---- TPU engine ----
    args = (imgs[0].rgb, imgs[0].mask, imgs[1].rgb, imgs[1].mask,
            cams[0], cams[1], cfg)

    t0 = time.time()
    res = compute_depth_maps(*args, dtype=jnp.float32)
    np.asarray(res.depth_left)   # D2H fetch: block_until_ready is
    log(f"warmup (incl compile): {time.time() - t0:.1f}s")  # unreliable here

    # time with per-iteration input perturbation (so no layer can memoize)
    # and a forced device-to-host fetch per iteration (real sync)
    n_iter = 3
    times = []
    for i in range(n_iter):
        r_l = imgs[0].rgb.copy()
        r_l[..., 0] += np.float32(i + 1) * np.float32(1e-3)
        v = (r_l, imgs[0].mask, imgs[1].rgb, imgs[1].mask,
             cams[0], cams[1], cfg)
        t0 = time.time()
        res = compute_depth_maps(*v, dtype=jnp.float32)
        np.asarray(res.depth_left)
        np.asarray(res.depth_right)
        times.append(time.time() - t0)
    dt = min(times)
    views_per_s = 2.0 / dt  # both views of the pair per call
    log(f"engine: {dt:.3f}s/pair -> {views_per_s:.2f} views/s "
        f"(times: {[round(t, 3) for t in times]})")

    d = np.asarray(res.depth_left)
    log(f"depth map: finite={np.isfinite(d).mean():.3f} "
        f"inf={np.isinf(d).mean():.3f}")

    vs = views_per_s / baseline["views_per_s"]
    print(json.dumps({
        "metric": "bunny twoview cost-volume views/s/chip "
                  "(r5 geodesic NCC, 100 depths, scale 0.5, cross-checked)",
        "value": round(views_per_s, 3),
        "unit": "views/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
