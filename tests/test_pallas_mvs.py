"""Fused MVS Pallas kernel == exact (gather) method, interpret mode.

The kernel (ops/pallas_mvs.py) implements the reference's EXACT
``(int)``-cast tap semantics including the (-1, 0) truncation-clamp
strip, so its WTA picks must match the oracle-parity "exact" method
pixel-for-pixel on the synthetic rig.  Real-chip validation: bench.py
quality gates vs the native golden (BENCH_r04)."""

import numpy as np
import jax
import jax.numpy as jnp

from stereoreconstruction_tpu.stereo.multiview import (
    select_neighbours, mvs_initial_estimate_oneview)

from test_multiview import make_rig, CFG


def test_full_pipeline_padded_neighbours(rng):
    """mvs_depth_maps(method='pallas') == method='exact' through the
    batched + fused-cross-check path, including neighbour PADDING
    (views with fewer neighbours mask their pad slots via nbr_valid in
    the kernel)."""
    from stereoreconstruction_tpu.stereo.multiview import mvs_depth_maps
    from stereoreconstruction_tpu.geometry import make_camera

    cams, _, rgbs, masks = make_rig(rng)
    # twist the last camera past the |dot| > 0.2 rule against part of
    # the arc -> neighbour lists of different lengths (the fixture of
    # test_multiview.test_heterogeneous_neighbour_counts_match_oracle)
    ang = 1.45
    R = np.array([[np.cos(ang), 0, np.sin(ang)],
                  [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    C = np.array([-np.sin(0.15) * 60.0, 0.0, 60.0 - np.cos(0.15) * 60.0])
    cams[3] = make_camera(np.asarray(cams[0].K), R, R @ -C)
    nbrs = select_neighbours(cams, CFG)
    assert len({len(n) for n in nbrs}) > 1, \
        f"fixture needs mixed neighbour counts, got {nbrs}"
    de = np.asarray(mvs_depth_maps(rgbs, masks, cams, CFG,
                                   method="exact", dtype=jnp.float32))
    dp = np.asarray(mvs_depth_maps(rgbs, masks, cams, CFG,
                                   method="pallas", dtype=jnp.float32))
    same = ((de == dp) | (np.isnan(de) & np.isnan(dp))
            | (np.isinf(de) & np.isinf(dp)))
    assert same.mean() == 1.0, f"{(~same).sum()} pixels differ"


def test_topk_last_entry_is_wta(rng):
    """The kernel's n_topk=K list degenerates to the WTA carry at its
    last (largest) entry: finalizing top[-1] must reproduce the
    n_topk=1 production map bit-for-bit (the ascending-insert tie rule
    IS the WTA >= rule — ops/pallas_mvs.py docstring)."""
    cams, _, rgbs, masks = make_rig(rng)
    nbrs = select_neighbours(cams, CFG)
    dt = jnp.float32
    cams32 = [c.astype(dt) for c in cams]
    grays = 0.11 * rgbs[..., 0] + 0.59 * rgbs[..., 1] + 0.3 * rgbs[..., 2]
    i = 0
    nbr = nbrs[i]
    cams_nbr = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[cams32[j] for j in nbr])
    args = (jnp.asarray(rgbs[i], dt), jnp.asarray(grays[i], dt),
            jnp.asarray(masks[i]), jnp.asarray(grays[nbr], dt),
            jnp.asarray(masks[nbr]), cams32[i], cams_nbr, CFG, len(nbr))
    kw = dict(enable_refraction=False, enable_distortion=False,
              method="pallas")
    wta = np.asarray(mvs_initial_estimate_oneview(*args, **kw))
    top_n, top_d = mvs_initial_estimate_oneview(*args, with_topk=True,
                                                **kw)
    top_n, top_d = np.asarray(top_n), np.asarray(top_d)
    # finalize the last entry the way mvs_finalize_wta does (no-peak
    # slots carry ncc 0 < threshold; real peaks are > 0.95)
    last = np.where(top_n[-1] > CFG.ncc_threshold, top_d[-1], -1.0)
    want = np.where(np.asarray(masks[i]), last, np.inf)
    np.testing.assert_array_equal(want, wta)


def test_topk_matches_exact_topk(rng):
    """Kernel top-K hypothesis sets == the exact (gather) method's
    top-K on the synthetic rig (same fixture on which the WTA picks
    match pixel-for-pixel)."""
    cams, _, rgbs, masks = make_rig(rng)
    nbrs = select_neighbours(cams, CFG)
    dt = jnp.float32
    cams32 = [c.astype(dt) for c in cams]
    grays = 0.11 * rgbs[..., 0] + 0.59 * rgbs[..., 1] + 0.3 * rgbs[..., 2]
    i = 1
    nbr = nbrs[i]
    cams_nbr = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[cams32[j] for j in nbr])
    args = (jnp.asarray(rgbs[i], dt), jnp.asarray(grays[i], dt),
            jnp.asarray(masks[i]), jnp.asarray(grays[nbr], dt),
            jnp.asarray(masks[nbr]), cams32[i], cams_nbr, CFG, len(nbr))
    kw = dict(enable_refraction=False, enable_distortion=False,
              with_topk=True)
    en, ed = mvs_initial_estimate_oneview(*args, method="exact", **kw)
    pn, pd = mvs_initial_estimate_oneview(*args, method="pallas", **kw)
    en, ed = np.asarray(en), np.asarray(ed)
    pn, pd = np.asarray(pn), np.asarray(pd)
    # compare per-pixel hypothesis DEPTH SETS (sorted by depth): the two
    # backends' f32 NCC orders differ in the last bits, which may swap
    # near-tie orderings inside the list but not its membership
    es = np.sort(ed, axis=0)
    ps = np.sort(pd, axis=0)
    match = np.mean(es == ps)
    assert match >= 0.999, f"hypothesis sets differ: {1 - match:.4f}"
    # matching entries carry near-identical NCCs
    both = (es == ps) & (np.sort(en, axis=0) > 0)
    diff = np.abs(np.sort(en, axis=0) - np.sort(pn, axis=0))[both]
    assert diff.size and float(diff.max()) < 1e-4


def test_pallas_matches_exact(rng):
    cams, _, rgbs, masks = make_rig(rng)
    nbrs = select_neighbours(cams, CFG)
    dt = jnp.float32
    cams32 = [c.astype(dt) for c in cams]
    grays = 0.11 * rgbs[..., 0] + 0.59 * rgbs[..., 1] + 0.3 * rgbs[..., 2]

    for i in (0, 1):
        nbr = nbrs[i]
        cams_nbr = jax.tree.map(lambda *xs: jnp.stack(xs),
                                *[cams32[j] for j in nbr])
        args = (jnp.asarray(rgbs[i], dt), jnp.asarray(grays[i], dt),
                jnp.asarray(masks[i]), jnp.asarray(grays[nbr], dt),
                jnp.asarray(masks[nbr]), cams32[i], cams_nbr, CFG,
                len(nbr))
        kw = dict(enable_refraction=False, enable_distortion=False)
        de = np.asarray(mvs_initial_estimate_oneview(
            *args, method="exact", **kw))
        dp = np.asarray(mvs_initial_estimate_oneview(
            *args, method="pallas", **kw))
        same = ((de == dp) | (np.isnan(de) & np.isnan(dp))
                | (np.isinf(de) & np.isinf(dp)))
        assert same.mean() == 1.0, (
            f"view {i}: {(~same).sum()} pixels differ")


def test_sample_nearest_bit_exact(rng):
    """pallas_sample_nearest == the XLA clamped-trunc gather, bit-for-bit,
    including NaN/inf sentinel handling (the MVS cross-check's hot read,
    multiviewstereo.cpp:698)."""
    from stereoreconstruction_tpu.ops.pallas_sample import (
        pallas_sample_nearest)
    v, hs, ws = 3, 40, 56
    src = rng.uniform(10, 90, (v, hs, ws)).astype(np.float32)
    src[0, 5, 7] = np.nan
    src[1, :3] = np.inf
    src[2, 10:12, 20:30] = -1.0
    h, w = 24, 40
    x2 = rng.uniform(-10, ws + 10, (v, h, w)).astype(np.float32)
    y2 = rng.uniform(-10, hs + 10, (v, h, w)).astype(np.float32)
    # patch_h=64 >= hs: every in-map coordinate is covered even for
    # these incoherent random coords (production coords are per-tile
    # coherent; missed ones are counted + reported not-finite)
    vals, fin, oob = pallas_sample_nearest(
        jnp.asarray(src), jnp.asarray(x2), jnp.asarray(y2),
        patch_h=64, interpret=True)
    vals, fin = np.asarray(vals), np.asarray(fin)
    ix = np.clip(np.trunc(x2).astype(np.int32), 0, ws - 1)
    iy = np.clip(np.trunc(y2).astype(np.int32), 0, hs - 1)
    want = np.stack([src[j][iy[j], ix[j]] for j in range(v)])
    want_fin = np.isfinite(want)
    assert float(oob) == 0.0
    np.testing.assert_array_equal(fin, want_fin)
    np.testing.assert_array_equal(vals[want_fin], want[want_fin])

    # undersized patches: misses are conservative (finite only where
    # the full-coverage run was finite, values still exact there)
    v8, f8, oob8 = pallas_sample_nearest(
        jnp.asarray(src), jnp.asarray(x2), jnp.asarray(y2),
        patch_h=8, interpret=True)
    v8, f8 = np.asarray(v8), np.asarray(f8)
    assert float(oob8) > 0.0
    assert not (f8 & ~want_fin).any()
    np.testing.assert_array_equal(v8[f8], want[f8])
