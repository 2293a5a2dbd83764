import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from stereoreconstruction_tpu.config import TwoViewConfig
from stereoreconstruction_tpu.data.project_io import load_project
from stereoreconstruction_tpu.data.images import load_image
from stereoreconstruction_tpu.stereo.twoview import compute_depth_map_oneview
from stereoreconstruction_tpu.data.images import to_gray
import oracle as orc

proj = load_project("/root/reference/example/project.xml")
bunny = proj.image_sets["bunny"]
cfg = TwoViewConfig(num_depth_levels=30)

cam_ids = ["7310085", "7310087"]
recs = [proj.cameras[c] for c in cam_ids]
cams = [r.to_camera() for r in recs]
ocams = []
for r in recs:
    K, R, t, _ = r.decompose()
    ocams.append(orc.OracleCamera(K, R, t, dist=r.dist))
imgs = [load_image(bunny.default_image_for_camera(c).file, cfg.image_scale)
        for c in cam_ids]

# Pick a few in-mask pixels and trace the oracle's cost curve
mask = imgs[0].mask
ys, xs = np.where(mask)
sel = [(ys[len(ys)//2], xs[len(ys)//2]), (ys[len(ys)//4], xs[len(ys)//4])]
print("pixels:", sel)

rgb_l, rgb_r = imgs[0].rgb.astype(np.float64), imgs[1].rgb.astype(np.float64)
mask_l, mask_r = imgs[0].mask, imgs[1].mask

C, pr_dir = ocams[0].principal_ray()
for (y, x) in sel:
    weights = orc.oracle_geodesic_weights(rgb_l, x, y, cfg.window_radius)
    ro, rd = orc.oracle_unproject(ocams[0], (x + 0.5) / cfg.image_scale,
                                  (y + 0.5) / cfg.image_scale)
    costs = []
    for lab in range(cfg.num_depth_levels):
        dep = orc.depth_from_label(lab, cfg.num_depth_levels, cfg.min_depth,
                                   cfg.max_depth)
        pt = orc.point_from_depth(ro, rd, pr_dir, dep, ocams[0].C)
        if pt is None:
            costs.append((lab, dep, None, None))
            continue
        px, py, ok = orc.oracle_project(ocams[1], pt)
        x2 = px * cfg.image_scale - 0.5
        y2 = py * cfg.image_scale - 0.5
        c = orc.oracle_cost_ncc(rgb_l, rgb_r, mask_l, mask_r, weights,
                                x, y, x2, y2, cfg.window_radius)
        costs.append((lab, round(dep, 1), (round(x2, 1), round(y2, 1)),
                      round(c, 3)))
    print(f"pixel ({y},{x}):")
    for c in costs[::3]:
        print("   ", c)
