"""Scratch: run the two-view engine on the bunny pair at README settings on
whatever backend JAX picks (TPU under axon)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from stereoreconstruction_tpu.config import TwoViewConfig
from stereoreconstruction_tpu.data.project_io import load_project
from stereoreconstruction_tpu.data.images import load_image
from stereoreconstruction_tpu.stereo.twoview import compute_depth_maps

print("devices:", jax.devices())

proj = load_project("/root/reference/example/project.xml")
bunny = proj.image_sets["bunny"]
cfg = TwoViewConfig(min_depth=30.0, max_depth=80.0)  # shipped P units ~cm: bunny at ~50

cam_ids = ["7310085", "7310087"]
cams = [proj.cameras[c].to_camera() for c in cam_ids]
imgs = [load_image(bunny.default_image_for_camera(c).file, cfg.image_scale)
        for c in cam_ids]
print("image:", imgs[0].rgb.shape, "mask cover:", imgs[0].mask.mean())

t0 = time.time()
res = compute_depth_maps(imgs[0].rgb, imgs[0].mask, imgs[1].rgb, imgs[1].mask,
                         cams[0], cams[1], cfg, dtype=jnp.float32)
jax.block_until_ready(res)
t1 = time.time()
print(f"first call (incl compile): {t1 - t0:.1f}s")

t0 = time.time()
res = compute_depth_maps(imgs[0].rgb, imgs[0].mask, imgs[1].rgb, imgs[1].mask,
                         cams[0], cams[1], cfg, dtype=jnp.float32)
jax.block_until_ready(res)
t1 = time.time()
print(f"second call: {t1 - t0:.2f}s -> {2 / (t1 - t0):.2f} views/s")

d = np.asarray(res.depth_left)
print("finite:", np.isfinite(d).mean(), "nan:", np.isnan(d).mean(),
      "inf:", np.isinf(d).mean())
print("depth range:", np.nanmin(np.where(np.isfinite(d), d, np.nan)),
      np.nanmax(np.where(np.isfinite(d), d, np.nan)))
