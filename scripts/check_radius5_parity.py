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

    out["ok"] = bool(out["weights_ok"] and out["ncc_ok"]
                     and out["refractive_ok"])
    print(json.dumps(out))
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
