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
