"""Generate the independent bunny golden anchor from the native C++ oracle
(runtime/native/twoview_oracle.cpp) at the bench config (scale 0.5, 100
depth levels, depth [30, 80], r5 geodesic NCC) — VERDICT r1 item 9.

The golden is the *pre-cross-check* WTA depth map for both views of the
bunny pair; cross-check parity is tested separately (the jitted
cross_check_pair is oracle-validated in tests/test_twoview.py).

Writes tests/golden/bunny_native_s05_d100.npz with float32 depth maps
(NaN = masked/never evaluated, +inf = evaluated-but-rejected).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stereoreconstruction_tpu.config import TwoViewConfig
from stereoreconstruction_tpu.data.project_io import load_project
from stereoreconstruction_tpu.data.images import load_image
from stereoreconstruction_tpu.runtime.native import (
    twoview_depth_map_native, native_num_threads)


def main():
    proj = load_project("/root/reference/example/project.xml")
    bunny = proj.image_sets["bunny"]
    cfg = TwoViewConfig(min_depth=30.0, max_depth=80.0)
    cam_ids = ["7310085", "7310087"]
    cams = [proj.cameras[c].to_camera() for c in cam_ids]
    imgs = [load_image(bunny.default_image_for_camera(c).file,
                       cfg.image_scale) for c in cam_ids]

    print(f"threads: {native_num_threads()}", flush=True)
    t0 = time.time()
    d_l = twoview_depth_map_native(
        imgs[0].rgb, imgs[0].mask, imgs[1].rgb, imgs[1].mask,
        cams[0], cams[1], cfg)
    print(f"left view: {time.time() - t0:.0f}s  "
          f"finite={np.isfinite(d_l).mean():.3f}", flush=True)
    t0 = time.time()
    d_r = twoview_depth_map_native(
        imgs[1].rgb, imgs[1].mask, imgs[0].rgb, imgs[0].mask,
        cams[1], cams[0], cfg)
    print(f"right view: {time.time() - t0:.0f}s  "
          f"finite={np.isfinite(d_r).mean():.3f}", flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "bunny_native_s05_d100.npz")
    np.savez_compressed(
        out,
        depth_left=d_l.astype(np.float32),
        depth_right=d_r.astype(np.float32),
        config=np.array([cfg.min_depth, cfg.max_depth,
                         cfg.num_depth_levels, cfg.image_scale,
                         cfg.window_radius], np.float64),
        cameras=np.array(cam_ids))
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
