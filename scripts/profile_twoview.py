"""Stage-by-stage profile of the two-view fast path on the real chip."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from stereoreconstruction_tpu.config import TwoViewConfig
from stereoreconstruction_tpu.data.project_io import load_project
from stereoreconstruction_tpu.data.images import load_image
from stereoreconstruction_tpu.geometry.camera import principal_ray
from stereoreconstruction_tpu.ops.weights import compute_weights
from stereoreconstruction_tpu.ops.ncc_fast import (
    make_ref_view, warp_other, fast_cost_plane)
from stereoreconstruction_tpu.stereo.depthsweep import (
    depth_labels_twoview, pixel_rays, point_from_depth, match_points)

proj = load_project("/root/reference/example/project.xml")
bunny = proj.image_sets["bunny"]
cfg = TwoViewConfig(min_depth=30.0, max_depth=80.0)
cam_ids = ["7310085", "7310087"]
cams = [proj.cameras[c].to_camera().astype(jnp.float32) for c in cam_ids]
imgs = [load_image(bunny.default_image_for_camera(c).file, cfg.image_scale)
        for c in cam_ids]
rgb_l = jnp.asarray(imgs[0].rgb, jnp.float32)
mask_l = jnp.asarray(imgs[0].mask, bool)
gray_l = 0.11*rgb_l[..., 0] + 0.59*rgb_l[..., 1] + 0.3*rgb_l[..., 2]
rgb_r = jnp.asarray(imgs[1].rgb, jnp.float32)
mask_r = jnp.asarray(imgs[1].mask, bool)
gray_r = 0.11*rgb_r[..., 0] + 0.59*rgb_r[..., 1] + 0.3*rgb_r[..., 2]
h, w = gray_l.shape
radius = cfg.window_radius
D = cfg.num_depth_levels
print("devices:", jax.devices(), "shape:", (h, w), "D:", D)


def timeit(name, fn, *a, n=3):
    r = jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts)*1e3:8.1f} ms")
    return r


# stage 1: weights
f_w = jax.jit(lambda rgb: compute_weights(rgb, radius, cfg.weights))
weights = timeit("weights (geodesic)", f_w, rgb_l)

# stage 2: rays
f_rays = jax.jit(lambda: pixel_rays(cams[0], h, w, cfg.image_scale,
                                    dtype=jnp.float32))
ray_o, ray_d = timeit("pixel_rays", f_rays)
depths = depth_labels_twoview(cfg.min_depth, cfg.max_depth, D,
                              dtype=jnp.float32)
_, nrm = principal_ray(cams[0])
nrm = nrm.astype(jnp.float32)
ctr = cams[0].C.astype(jnp.float32)

# stage 3: all match points (projection incl. refraction) over D depths
def all_match(ray_o, ray_d):
    def body(_, d):
        pts, pv = point_from_depth(ray_o, ray_d, ctr, nrm, depths[d])
        xy, mv = match_points(cams[1], pts, pv, cfg.image_scale)
        return (), (xy, mv)
    return lax.scan(body, (), jnp.arange(D))[1]
f_match = jax.jit(all_match)
xy_all, mv_all = timeit("match_points x100", f_match, ray_o, ray_d)

# stage 4: warps over D depths
def all_warp(xy_all, mv_all):
    def body(_, d):
        return (), warp_other(gray_r, mask_r, xy_all[d, ..., 0],
                              xy_all[d, ..., 1], mv_all[d])
    return lax.scan(body, (), jnp.arange(D))[1]
f_warp = jax.jit(all_warp)
warp_vol, wv_vol = timeit("warp x100", f_warp, xy_all, mv_all)

# stage 5: cost planes + WTA over D depths
ref_view = make_ref_view(gray_l, mask_l, weights, radius)
def all_cost(warp_vol, wv_vol):
    inf = jnp.full((h, w), jnp.inf, jnp.float32)
    nan = jnp.full((h, w), jnp.nan, jnp.float32)
    def body(c, d):
        mc, sec, best = c
        cost = fast_cost_plane(ref_view, warp_vol[d], wv_vol[d])
        better = cost + 1e-10 < mc
        return (jnp.where(better, cost, mc), jnp.where(better, mc, sec),
                jnp.where(better, depths[d], best)), ()
    return lax.scan(body, (inf, inf, nan), jnp.arange(D))[0]
f_cost = jax.jit(all_cost)
mc, sec, best = timeit("cost+WTA x100", f_cost, warp_vol, wv_vol)
print("finite best frac:", float(jnp.isfinite(best).mean()))
