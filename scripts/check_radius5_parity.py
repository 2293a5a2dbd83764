"""Radius-5 (production) parity of BOTH Pallas kernels on REAL TPU.

The CI suite checks the kernels in interpret mode at radius 2/3 (the
radius-generalized indexing); the 121-tap production radius is
unaffordable under the CPU interpreter (tens of GB, >30 min), so this
script runs the same checks on the real chip each round and prints a
JSON verdict (recorded in PARITY.md):

  * pallas_geodesic_weights(radius=5)  vs the NATIVE f64 oracle
    (runtime/native geodesic_weights_image — the literal
    geodesicweight.cpp:59-135 port).  The XLA formulation is checked
    against the same oracle; comparing the two f32 TPU paths against
    each other (the pre-round-4 version of this script) conflated
    their independent f32 rounding orders — and hid that the XLA path
    itself was wrong on TPU until round 4 (window_patches im2col conv
    ran the MXU at default bf16 precision, snapping values to the bf16
    grid: 1.2e-3 weight error attributed to the WRONG side).
  * compute_depth_map_oneview(pallas)  vs fast — identical WTA picks (the
    kernel reproduces the fast path's f32 accumulation order bit-for-bit)

Weight tolerance 2e-5: both TPU paths are f32; the native oracle is f64.
Measured f32-rounding floor ~3e-6 (pallas) / ~8e-6 (XLA) on random
probes; 2e-5 leaves 2x headroom while sitting 50x below the bf16
corruption this check exists to catch.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))


def main():
    assert jax.default_backend() == "tpu", (
        f"needs the real chip, got {jax.default_backend()}")
    from stereoreconstruction_tpu.config import TwoViewConfig, WeightConfig
    from stereoreconstruction_tpu.ops.weights import geodesic_weights
    from stereoreconstruction_tpu.ops.pallas_weights import (
        pallas_geodesic_weights)
    from stereoreconstruction_tpu.runtime.native import (
        geodesic_weights_native)
    from stereoreconstruction_tpu.stereo.twoview import compute_depth_maps

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from synth import converging_rig, render_scene

    out = {"radius": 5}
    rng = np.random.default_rng(0)

    # --- weight kernels vs the native f64 oracle ---
    rgb_np = rng.uniform(0, 255, (96, 130, 3)).astype(np.float32)
    rgb = jnp.asarray(rgb_np)
    want = geodesic_weights_native(rgb_np, 5)
    got_pallas = np.asarray(pallas_geodesic_weights(rgb, 5))
    got_xla = np.asarray(geodesic_weights(rgb, 5, exact=False))
    perr = float(np.max(np.abs(got_pallas - want)))
    xerr = float(np.max(np.abs(got_xla - want)))
    out["weights_max_abs_err"] = perr
    out["weights_xla_max_abs_err"] = xerr
    out["weights_ok"] = bool(perr < 2e-5 and xerr < 2e-5)

    # --- NCC/WTA kernel vs fast path (bit-level pick agreement) ---
    cfg = TwoViewConfig(window_radius=5, min_depth=45.0, max_depth=80.0,
                        num_depth_levels=24, image_scale=1.0,
                        weights=WeightConfig(kind="geodesic"))
    cams = converging_rig(2, refractive=False)
    rgbs, masks, _ = render_scene(cams, 64, 80, plane_dist=60.0,
                                  enable_refraction=False)

    def run(method):
        r = compute_depth_maps(rgbs[0], masks[0], rgbs[1], masks[1],
                               cams[0], cams[1], cfg, cross_check=False,
                               method=method, dtype=jnp.float32,
                               enable_refraction=False)
        return np.asarray(r.depth_left), np.asarray(r.depth_right)

    f = run("fast")
    p = run("pallas")
    agree = []
    for fi, pi in zip(f, p):
        same_class = ((np.isnan(fi) == np.isnan(pi))
                      & (np.isinf(fi) == np.isinf(pi)))
        both = np.isfinite(fi) & np.isfinite(pi)
        val_ok = np.abs(fi[both] - pi[both]) <= 1e-5
        agree.append(float((same_class.mean() + val_ok.mean()) / 2))
    out["ncc_wta_pick_agreement"] = min(agree)
    out["ncc_ok"] = bool(min(agree) > 0.995)

    # --- refractive path on the chip: fast/pallas vs exact ---
    # (the quartic interface solve + Snell unprojection run at f32 on
    # real TPU only here — CI exercises them on the CPU backend)
    rcams = converging_rig(2, refractive=True)
    rr, rm, _ = render_scene(rcams, 48, 64, plane_dist=60.0,
                             enable_refraction=True)
    rcfg = TwoViewConfig(window_radius=2, min_depth=45.0, max_depth=80.0,
                         num_depth_levels=16, image_scale=1.0,
                         weights=WeightConfig(kind="geodesic"))

    def run_refr(method):
        r = compute_depth_maps(rr[0], rm[0], rr[1], rm[1], rcams[0],
                               rcams[1], rcfg, method=method,
                               dtype=jnp.float32)
        return np.asarray(r.depth_left), np.asarray(r.depth_right)

    ex = run_refr("exact")
    worst = 1.0
    for method in ("fast", "pallas"):
        got = run_refr(method)
        for a, b in zip(got, ex):
            both = np.isfinite(a) & np.isfinite(b)
            if both.any():
                med = float(np.median(np.abs(a[both] - b[both])))
            else:
                med = np.inf
            worst = min(worst, 1.0 if med <= 1e-3 else 0.0)
    out["refractive_ok"] = bool(worst >= 1.0)

    # --- shard_map x REAL Pallas composition on the chip (VERDICT r4
    # item 4): the CI suite can only run the kernel's block contract
    # (row0/full_h) outside shard_map — the interpret-mode DMA emulation
    # deadlocks inside CPU shard_map partitions.  Here the real kernel
    # runs UNDER jax.shard_map on a 1x1 device mesh (one chip is all we
    # have; the block code path is the same one an n-row mesh executes:
    # halo-padded block, axis_index-derived row0, all_gather cross-check)
    # and must reproduce the unsharded pallas maps bit-for-bit.
    from stereoreconstruction_tpu.parallel.rowshard import (
        make_mesh, stack_cameras, twoview_pairs_rowsharded)
    mesh = make_mesh(1, 1)
    want = run("pallas")     # unsharded production pallas maps (above)
    dl, dr = twoview_pairs_rowsharded(
        mesh, rgbs[:1], masks[:1], rgbs[1:2], masks[1:2],
        stack_cameras([cams[0]]), stack_cameras([cams[1]]), cfg,
        cross_check=False, method="pallas", dtype=jnp.float32,
        enable_refraction=False)
    sm_ok = True
    for got, ref in ((np.asarray(dl[0]), want[0]),
                     (np.asarray(dr[0]), want[1])):
        same_class = ((np.isnan(got) == np.isnan(ref))
                      & (np.isinf(got) == np.isinf(ref)))
        both = np.isfinite(got) & np.isfinite(ref)
        sm_ok = sm_ok and bool(same_class.all()
                               and (got[both] == ref[both]).all())
    out["shardmap_pallas_ok"] = bool(sm_ok)

    # --- depth-slab MVS Pallas under shard_map on the chip (VERDICT r4
    # item 3): mvs_initial_estimate_depthsharded(method="pallas") on a
    # 1-device "depth" mesh (slab interface + axis_index label0 +
    # all_gather merge, the exact code an n-slab mesh runs) must
    # bit-match the unsharded kernel for BOTH the WTA map and the top-K
    # hypothesis volume.  n-slab boundaries are covered in interpret
    # mode by tests/test_depthshard.py::TestPallasSlabContract.
    from stereoreconstruction_tpu.config import MultiViewConfig
    from stereoreconstruction_tpu.parallel.depthshard import (
        make_depth_mesh, mvs_initial_estimate_depthsharded)
    from stereoreconstruction_tpu.stereo.multiview import (
        mvs_initial_estimate_oneview)
    mcams = converging_rig(3, refractive=False)
    mr, mm, _ = render_scene(mcams, 48, 64, plane_dist=60.0,
                             enable_refraction=False)
    mcfg = MultiViewConfig(window_radius=2, min_depth=45.0,
                           max_depth=80.0, num_depth_levels=16,
                           image_scale=1.0)
    mgrays = (0.11 * mr[..., 0] + 0.59 * mr[..., 1]
              + 0.3 * mr[..., 2]).astype(np.float32)
    mcams32 = [c.astype(jnp.float32) for c in mcams]
    m_nbr = jax.tree.map(lambda *xs: jnp.stack(xs), *mcams32[1:])
    margs = (jnp.asarray(mr[0], jnp.float32), jnp.asarray(mgrays[0]),
             jnp.asarray(mm[0]), jnp.asarray(mgrays[1:]),
             jnp.asarray(mm[1:]), mcams32[0], m_nbr)
    dmesh = make_depth_mesh(1)
    ds_ok = True
    for with_topk in (False, True):
        want = mvs_initial_estimate_oneview(
            *margs, mcfg, 2, enable_refraction=False,
            enable_distortion=False, method="pallas",
            with_topk=with_topk)
        got = mvs_initial_estimate_depthsharded(
            dmesh, *margs, mcfg, enable_refraction=False,
            enable_distortion=False, method="pallas",
            with_topk=with_topk)
        for g, wv in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            g, wv = np.asarray(g), np.asarray(wv)
            same = ((g == wv) | (np.isnan(g) & np.isnan(wv))
                    | (np.isinf(g) & np.isinf(wv) & (np.sign(g)
                                                     == np.sign(wv))))
            ds_ok = ds_ok and bool(same.all())
    out["depthshard_pallas_ok"] = bool(ds_ok)

    out["ok"] = bool(out["weights_ok"] and out["ncc_ok"]
                     and out["refractive_ok"]
                     and out["shardmap_pallas_ok"]
                     and out["depthshard_pallas_ok"])
    print(json.dumps(out))
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
