"""Compare full-pipeline two-view methods on the real chip."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from stereoreconstruction_tpu.config import TwoViewConfig
from stereoreconstruction_tpu.data.project_io import load_project
from stereoreconstruction_tpu.data.images import load_image
from stereoreconstruction_tpu.stereo.twoview import compute_depth_maps

proj = load_project("/root/reference/example/project.xml")
bunny = proj.image_sets["bunny"]
cfg = TwoViewConfig(min_depth=30.0, max_depth=80.0)
cam_ids = ["7310085", "7310087"]
cams = [proj.cameras[c].to_camera() for c in cam_ids]
imgs = [load_image(bunny.default_image_for_camera(c).file, cfg.image_scale)
        for c in cam_ids]

for method in (sys.argv[1:] or ["fast", "pallas"]):
    args = (imgs[0].rgb, imgs[0].mask, imgs[1].rgb, imgs[1].mask,
            cams[0], cams[1], cfg)
    t0 = time.time()
    res = compute_depth_maps(*args, method=method, dtype=jnp.float32)
    np.asarray(res.depth_left); np.asarray(res.depth_right)
    print(f"{method}: warmup {time.time()-t0:.1f}s", flush=True)
    times = []
    for i in range(3):
        r_l = imgs[0].rgb.copy()
        r_l[..., 0] += np.float32(i + 1) * np.float32(1e-3)
        t0 = time.time()
        res = compute_depth_maps(r_l, imgs[0].mask, imgs[1].rgb,
                                 imgs[1].mask, cams[0], cams[1], cfg,
                                 method=method, dtype=jnp.float32)
        np.asarray(res.depth_left); np.asarray(res.depth_right)
        times.append(time.time() - t0)
    dl = np.asarray(res.depth_left)
    print(f"{method}: {min(times):.3f}s/pair -> {2/min(times):.2f} views/s "
          f"finite={np.isfinite(dl).mean():.3f} "
          f"(times {[round(t,3) for t in times]})", flush=True)
