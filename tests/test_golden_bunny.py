"""Golden regression: the exact-mode two-view engine must keep producing
the committed bunny depth maps bit-for-bit (f32, CPU).  Guards all future
refactors/optimizations of the exact path."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import example_project_available

needs_example = pytest.mark.skipif(not example_project_available(),
                                   reason="example project not mounted")

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "bunny_twoview_exact.npz")


@needs_example
def test_bunny_twoview_exact_matches_golden():
    from stereoreconstruction_tpu.config import TwoViewConfig
    from stereoreconstruction_tpu.data.project_io import load_project
    from stereoreconstruction_tpu.data.images import load_image
    from stereoreconstruction_tpu.stereo.twoview import compute_depth_maps

    proj = load_project("/root/reference/example/project.xml")
    bunny = proj.image_sets["bunny"]
    cfg = TwoViewConfig(min_depth=30.0, max_depth=80.0, image_scale=0.25,
                        num_depth_levels=20)
    cam_ids = ["7310085", "7310087"]
    cams = [proj.cameras[c].to_camera() for c in cam_ids]
    imgs = [load_image(bunny.default_image_for_camera(c).file,
                       cfg.image_scale) for c in cam_ids]
    res = compute_depth_maps(imgs[0].rgb, imgs[0].mask, imgs[1].rgb,
                             imgs[1].mask, cams[0], cams[1], cfg,
                             method="exact", dtype=jnp.float32)
    want = np.load(GOLDEN)
    for got, key in ((np.asarray(res.depth_left), "depth_left"),
                     (np.asarray(res.depth_right), "depth_right")):
        w = want[key]
        same = ((np.isnan(got) & np.isnan(w))
                | (np.isinf(got) & np.isinf(w))
                | (np.isfinite(got) & np.isfinite(w)
                   & np.isclose(got, np.where(np.isfinite(w), w, 0),
                                atol=1e-5)))
        frac = same.mean()
        assert frac > 0.999, f"{key}: only {frac:.4f} matches golden"
