"""Characterize MVS extra survivors vs the golden (VERDICT r4 item 7).

Produces the numbers in docs/mvs_extras.md: pre-cross-check
corroboration of extras (the reference's own acceptance criterion) and
the depth-edge attribution of the uncorroborated remainder.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
from scipy.ndimage import maximum_filter, minimum_filter
from stereoreconstruction_tpu.config import MultiViewConfig
from stereoreconstruction_tpu.data.project_io import load_project
from stereoreconstruction_tpu.data.images import load_image
from stereoreconstruction_tpu.stereo.multiview import mvs_depth_maps
from stereoreconstruction_tpu.stereo.twoview import cross_check_classify

proj = load_project("/root/reference/example/project.xml")
bunny = proj.image_sets["bunny"]
mcfg = MultiViewConfig(min_depth=30.0, max_depth=80.0, cross_check_threshold=0.5)
ids = sorted(c for c in proj.cameras if bunny.default_image_for_camera(c) is not None)
cams = [proj.cameras[c].to_camera() for c in ids]
imgs = [load_image(bunny.default_image_for_camera(c).file, mcfg.image_scale) for c in ids]
rgbs = np.stack([i.rgb for i in imgs]); masks = np.stack([i.mask for i in imgs])
md = np.asarray(mvs_depth_maps(rgbs, masks, cams, mcfg))
mg = np.load(os.path.join(os.path.dirname(__file__), "..", "tests",
                          "golden", "bunny_native_mvs_s05_d100.npz"))
mcams32 = [c.astype(jnp.float32) for c in cams]
h, w = md[0].shape
yy, xx = np.mgrid[0:h, 0:w]
labels = np.linspace(30, 80, 100)
agg = {"n_extra": 0, "n_unc": 0, "unc_border": 0, "unc_depth_lo": 0,
       "unc_depth_hi": 0, "unc_pre_disagree": 0, "unc_edge": 0}
for i in range(len(ids)):
    g = np.isfinite(md[i]) & (md[i] >= 0)
    wc = np.isfinite(mg["depths_post"][i]) & (mg["depths_post"][i] >= 0)
    extra = g & ~wc
    corr = np.zeros((h, w), bool); chk = np.zeros((h, w), bool)
    for j in range(len(ids)):
        if j == i:
            continue
        c_, k_ = cross_check_classify(
            jnp.asarray(np.where(extra, md[i], np.nan), jnp.float32),
            jnp.asarray(mg["depths_pre"][j], jnp.float32),
            mcams32[i], mcams32[j], mcfg.image_scale,
            mcfg.cross_check_threshold)
        corr |= np.asarray(c_); chk |= np.asarray(k_)
    unc = extra & chk & ~corr
    gp = mg["depths_pre"][i]
    pre_ok = np.isfinite(gp) & (gp >= 0)
    agree_pre = np.abs(np.where(pre_ok, gp, np.nan) - md[i]) <= 0.51
    dmax = maximum_filter(np.where(pre_ok, gp, -np.inf), size=5)
    dmin = minimum_filter(np.where(pre_ok, gp, np.inf), size=5)
    edge = (dmax - dmin) > 2.0
    border = (xx < 8) | (xx >= w - 8) | (yy < 8) | (yy >= h - 8)
    agg["n_extra"] += int(extra.sum()); agg["n_unc"] += int(unc.sum())
    agg["unc_border"] += int((unc & border).sum())
    agg["unc_depth_lo"] += int((unc & (md[i] <= labels[3])).sum())
    agg["unc_depth_hi"] += int((unc & (md[i] >= labels[-4])).sum())
    agg["unc_pre_disagree"] += int(
        (unc & pre_ok & ~np.nan_to_num(agree_pre, nan=False).astype(bool)).sum())
    agg["unc_edge"] += int((unc & edge).sum())
print("aggregate:", agg)
n = max(agg["n_unc"], 1)
print("uncorroborated extras: %.1f%% of extras"
      % (100 * agg["n_unc"] / max(agg["n_extra"], 1)))
for k in ("unc_border", "unc_depth_lo", "unc_depth_hi",
          "unc_pre_disagree", "unc_edge"):
    print(f"  {k}: {100 * agg[k] / n:.1f}%")
