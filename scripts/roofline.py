"""Roofline / bound analysis for the three production Pallas kernels
(VERDICT r4 item 1): per-kernel device time at the bench shape, a
parametric ablation that splits each kernel into fixed (DMA issue/wait,
loop, selection-matrix build) and per-tap (VPU/MXU) cost, and the
implied ceilings.  Emits docs/roofline.json; the interpretation lives
in docs/roofline.md.

Method:
* component times: one xplane device profile of each pipeline
  (runtime/xplane.py), aggregated over the "XLA Ops" line;
* kernel ablations: re-run the kernel at radius 0/1/2 (MVS) and
  1/3/5 (two-view NCC) on identical inputs — a linear fit
  t(radius) = fixed + per_tap * (2r+1)^2 attributes the time;
* bound models: VPU f32 throughput 4096 lanes * 0.94 GHz (v5e), MXU
  bf16 197 TFLOP/s, HBM ~820 GB/s.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timeit(f, *args, n=6):
    r = jax.block_until_ready(f(*args))
    best = np.inf
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(f(*args))
        best = min(best, time.time() - t0)
    return best, r


def main():
    from stereoreconstruction_tpu.config import (MultiViewConfig,
                                                 TwoViewConfig)
    from stereoreconstruction_tpu.data.project_io import load_project
    from stereoreconstruction_tpu.data.images import load_image
    from stereoreconstruction_tpu.stereo.multiview import (
        _mvs_pallas_sweep, select_neighbours)

    repo = os.path.join(os.path.dirname(__file__), "..")
    proj = load_project("/root/reference/example/project.xml")
    bunny = proj.image_sets["bunny"]
    out = {"hardware": "TPU v5e (1 chip): VPU ~3.85 Tf32op/s, "
                       "MXU 197 bf16 TFLOP/s, HBM ~820 GB/s"}

    # ---------------- MVS kernel: radius ablation ----------------
    mcfg0 = MultiViewConfig(min_depth=30.0, max_depth=80.0,
                            cross_check_threshold=0.5)
    ids = sorted(c for c in proj.cameras
                 if bunny.default_image_for_camera(c) is not None)
    cams = [proj.cameras[c].to_camera() for c in ids]
    imgs = [load_image(bunny.default_image_for_camera(c).file,
                       mcfg0.image_scale) for c in ids]
    nbrs = select_neighbours(cams, mcfg0)
    dt = jnp.float32
    cams32 = [c.astype(dt) for c in cams]
    rgbs = np.stack([i.rgb for i in imgs]).astype(np.float32)
    masks = np.stack([i.mask for i in imgs])
    grays = 0.11 * rgbs[..., 0] + 0.59 * rgbs[..., 1] + 0.3 * rgbs[..., 2]
    i = 0
    nbr = nbrs[i]
    cams_nbr = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[cams32[j] for j in nbr])
    import dataclasses

    mvs_abl = {}
    for radius in (0, 1, 2):
        mcfg = dataclasses.replace(mcfg0, window_radius=radius)
        f = jax.jit(lambda mcfg=mcfg: _mvs_pallas_sweep(
            jnp.asarray(rgbs[i]), jnp.asarray(grays[i]),
            jnp.asarray(masks[i]), jnp.asarray(grays[nbr]),
            jnp.asarray(masks[nbr]), cams32[i], cams_nbr, mcfg,
            enable_refraction=False, enable_distortion=False,
            nbr_valid=None))
        t, _ = timeit(f)
        mvs_abl[f"radius{radius}_s"] = round(t, 4)
        mvs_abl[f"radius{radius}_taps"] = (2 * radius + 1) ** 2
    # linear fit t = fixed + per_tap * taps (incl. the coords build,
    # which is radius-independent and folded into `fixed`)
    taps = np.array([1, 9, 25], float)
    ts = np.array([mvs_abl["radius0_s"], mvs_abl["radius1_s"],
                   mvs_abl["radius2_s"]])
    A = np.stack([np.ones(3), taps], 1)
    (fixed, per_tap), *_ = np.linalg.lstsq(A, ts, rcond=None)
    mvs_abl["fixed_s"] = round(float(fixed), 4)
    mvs_abl["per_tap_s"] = round(float(per_tap), 6)
    mvs_abl["production_fixed_frac"] = round(
        float(fixed / ts[2]), 3)
    out["mvs_kernel_ablation"] = mvs_abl

    # topk increment
    mcfg = mcfg0
    f9 = jax.jit(lambda: _mvs_pallas_sweep(
        jnp.asarray(rgbs[i]), jnp.asarray(grays[i]),
        jnp.asarray(masks[i]), jnp.asarray(grays[nbr]),
        jnp.asarray(masks[nbr]), cams32[i], cams_nbr, mcfg,
        enable_refraction=False, enable_distortion=False,
        nbr_valid=None, with_topk=True))
    t9, _ = timeit(f9)
    out["mvs_topk9_s"] = round(t9, 4)
    out["mvs_topk9_overhead_vs_wta"] = round(
        float(t9 / ts[2] - 1.0), 3)

    # ---------------- two-view kernels: radius ablation ----------------
    from stereoreconstruction_tpu.stereo.twoview import (
        compute_depth_maps)
    cfg0 = TwoViewConfig(min_depth=30.0, max_depth=80.0)
    cam_ids = ["7310085", "7310087"]
    tcams = [proj.cameras[c].to_camera() for c in cam_ids]
    timgs = [load_image(bunny.default_image_for_camera(c).file,
                        cfg0.image_scale) for c in cam_ids]
    targs = (timgs[0].rgb, timgs[0].mask, timgs[1].rgb, timgs[1].mask)

    tv_abl = {}
    for radius in (1, 3, 5):
        cfg = dataclasses.replace(cfg0, window_radius=radius)
        f = jax.jit(lambda cfg=cfg: compute_depth_maps(
            *targs, tcams[0], tcams[1], cfg, method="pallas",
            dtype=jnp.float32, cross_check=False).depth_left)
        t, _ = timeit(f)
        tv_abl[f"radius{radius}_s_per_view"] = round(t, 4)
    taps = np.array([9, 49, 121], float)
    ts = np.array([tv_abl["radius1_s_per_view"],
                   tv_abl["radius3_s_per_view"],
                   tv_abl["radius5_s_per_view"]])
    A = np.stack([np.ones(3), taps], 1)
    (fixed, per_tap), *_ = np.linalg.lstsq(A, ts, rcond=None)
    tv_abl["fixed_s"] = round(float(fixed), 4)
    tv_abl["per_tap_s"] = round(float(per_tap), 6)
    # NCC VPU bound: ~16 f32 ops/tap over H*W*D pixel-depths
    h, w = timgs[0].rgb.shape[:2]
    ncc_ops = 121 * 16.0 * h * w * cfg0.num_depth_levels
    tv_abl["ncc_vpu_bound_s"] = round(ncc_ops / 3.85e12, 4)
    tv_abl["ncc_measured_vs_bound"] = round(
        float(121 * per_tap / (ncc_ops / 3.85e12)), 2)
    out["twoview_ablation"] = tv_abl

    # ---------------- component profile (two-view pallas) -------------
    from stereoreconstruction_tpu.runtime.xplane import device_op_table
    res = compute_depth_maps(*targs, tcams[0], tcams[1], cfg0,
                             method="pallas", dtype=jnp.float32)
    jax.block_until_ready(res)
    logdir = "/tmp/trace_roofline_tv"
    jax.profiler.start_trace(logdir)
    for _ in range(2):
        res = compute_depth_maps(*targs, tcams[0], tcams[1], cfg0,
                                 method="pallas", dtype=jnp.float32)
        jax.block_until_ready(res)
    jax.profiler.stop_trace()
    _, table = device_op_table(logdir)

    def share(substr):
        return round(sum(s for k, (s, _) in table.items()
                         if substr in k) / 2, 4)

    out["twoview_components_s_per_pair"] = {
        "pallas_cost_wta": share("pallas_cost_wta"),
        "pallas_warp": share("warp_kernel") or share("pallas_warp"),
        "geodesic_weights": share("pallas_geodesic"),
        "cross_check": share("jit_cross_check"),
    }

    with open(os.path.join(repo, "docs", "roofline.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
