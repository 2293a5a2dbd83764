"""Generate the native MVS golden + CPU baseline timing for bench.py.

Runs the C++ MVS oracle (runtime/native mvs_depth_maps_native — scalar
reference semantics, OpenMP rows) on the 8-view bunny set at the bench
config (radius 2, 100 uniform depths, scale 0.5, depth [30, 80] in
shipped-calibration units, any-view cross-check 0.5), writing

  tests/golden/bunny_native_mvs_s05_d100.npz   (pre- and post-cross-check)
  MVS timing into BASELINE_MEASURED.json ("mvs" key)

Run once per config change; bench.py refuses to run its MVS arm without
the golden.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from stereoreconstruction_tpu.config import MultiViewConfig
    from stereoreconstruction_tpu.data.project_io import load_project
    from stereoreconstruction_tpu.data.images import load_image
    from stereoreconstruction_tpu.stereo.multiview import select_neighbours
    from stereoreconstruction_tpu.runtime.native import (
        mvs_depth_maps_native, native_num_threads)

    repo = os.path.join(os.path.dirname(__file__), "..")
    proj = load_project("/root/reference/example/project.xml")
    bunny = proj.image_sets["bunny"]
    cfg = MultiViewConfig(min_depth=30.0, max_depth=80.0,
                          cross_check_threshold=0.5)

    cam_ids = sorted(c for c in proj.cameras
                     if bunny.default_image_for_camera(c) is not None)
    cams = [proj.cameras[c].to_camera() for c in cam_ids]
    imgs = [load_image(bunny.default_image_for_camera(c).file,
                       cfg.image_scale) for c in cam_ids]
    rgbs = np.stack([i.rgb for i in imgs])
    masks = np.stack([i.mask for i in imgs])
    neighbours = select_neighbours(cams, cfg)
    print(f"{len(cams)} views {rgbs.shape}, neighbours={neighbours}, "
          f"{native_num_threads()} threads", flush=True)

    t0 = time.time()
    pre = mvs_depth_maps_native(rgbs, masks, cams, neighbours, cfg,
                                cross_check=False)
    t_initial = time.time() - t0
    print(f"initial estimates: {t_initial:.1f}s", flush=True)

    t0 = time.time()
    post = mvs_depth_maps_native(rgbs, masks, cams, neighbours, cfg,
                                 cross_check=True)
    t_full = time.time() - t0
    print(f"full (initial + cross-check): {t_full:.1f}s", flush=True)

    np.savez_compressed(
        os.path.join(repo, "tests", "golden",
                     "bunny_native_mvs_s05_d100.npz"),
        depths_pre=pre.astype(np.float32),
        depths_post=post.astype(np.float32),
        cam_ids=np.asarray(cam_ids))

    path = os.path.join(repo, "BASELINE_MEASURED.json")
    with open(path) as f:
        base = json.load(f)
    base["mvs"] = {
        "what": "reference-style C++/OpenMP MVS (Campbell 2009) depth "
                "maps, 8-view bunny, radius 2, 100 uniform depths, "
                "scale 0.5, any-view cross-check 0.5 "
                "(runtime/native mvs_depth_maps_native)",
        "seconds_total": t_full,
        "seconds_initial_estimates": t_initial,
        "views": len(cams),
        "views_per_s": len(cams) / t_full,
        "threads": native_num_threads(),
        "coverage_post": float(np.isfinite(post).mean()),
    }
    with open(path, "w") as f:
        json.dump(base, f, indent=1)
    print(json.dumps(base["mvs"], indent=1))


if __name__ == "__main__":
    main()
