"""Engine-vs-oracle parity for the multi-view stereo pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereoreconstruction_tpu.config import MultiViewConfig, WeightConfig
from stereoreconstruction_tpu.geometry import make_camera
from stereoreconstruction_tpu.stereo.multiview import (
    select_neighbours,
    mvs_depth_maps,
)

import oracle as orc
from test_twoview import smooth_image, depth_agreement


def make_rig(rng, n=4, h=18, w=22):
    """Small convergent rig looking at +z."""
    K = np.array([[35.0, 0, w / 2], [0, 35.0, h / 2], [0, 0, 1]])
    cams, ocams, rgbs, masks = [], [], [], []
    for i in range(n):
        ang = (i - (n - 1) / 2) * 0.1
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        C = np.array([-np.sin(ang) * 60.0, 0.0, 60.0 - np.cos(ang) * 60.0])
        t = R @ -C
        cams.append(make_camera(K, R, t))
        ocams.append(orc.OracleCamera(K, R, t))
        rgbs.append(smooth_image(rng, h, w))
        m = np.ones((h, w), bool)
        if i == 0:
            m[:3, :5] = False
        masks.append(m)
    return cams, ocams, np.stack(rgbs), np.stack(masks)


CFG = MultiViewConfig(
    min_depth=40.0,
    max_depth=90.0,
    num_depth_levels=8,
    image_scale=1.0,
    cross_check_threshold=3.0,
    weights=WeightConfig(kind="geodesic"),
)


class TestNeighbours:
    def test_select(self, rng):
        cams, _, _, _ = make_rig(rng, n=4)
        nb = select_neighbours(cams, CFG)
        assert len(nb) == 4
        for i, lst in enumerate(nb):
            assert i not in lst
            assert 1 <= len(lst) <= 3
        # closest camera to 0 is 1
        assert nb[0][0] == 1


class TestMVSParity:
    def test_initial_estimate_matches_oracle(self, rng):
        cams, ocams, rgbs, masks = make_rig(rng, n=3)
        got = mvs_depth_maps(rgbs, masks, cams, CFG, cross_check=False,
                             method="exact", dtype=jnp.float64)
        neighbours = select_neighbours(cams, CFG)
        for i in range(3):
            want = orc.oracle_mvs_oneview(rgbs, masks, ocams, i,
                                          neighbours[i], CFG)
            a = depth_agreement(got[i], want)
            assert a > 0.99, f"view {i} agreement {a}"

    def test_heterogeneous_neighbour_counts_match_oracle(self, rng):
        """Views with different neighbour counts share one padded compiled
        shape (nbr_valid masking) — must still match the oracle exactly."""
        cams, ocams, rgbs, masks = make_rig(rng, n=4)
        # twist the last camera so it fails the |dot| > 0.2 rule against
        # the far end of the arc -> neighbour lists of different lengths
        ang = 1.45
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        C = np.array([-np.sin(0.15) * 60.0, 0.0,
                      60.0 - np.cos(0.15) * 60.0])
        K = np.asarray(cams[0].K)
        cams[3] = make_camera(K, R, R @ -C)
        ocams[3] = orc.OracleCamera(K, R, R @ -C)

        neighbours = select_neighbours(cams, CFG)
        lens = {len(n) for n in neighbours}
        assert len(lens) > 1, f"fixture needs mixed counts, got {lens}"

        got = mvs_depth_maps(rgbs, masks, cams, CFG, cross_check=False,
                             method="exact", dtype=jnp.float64)
        for i in range(4):
            if not neighbours[i]:
                continue
            want = orc.oracle_mvs_oneview(rgbs, masks, ocams, i,
                                          neighbours[i], CFG)
            a = depth_agreement(got[i], want)
            assert a > 0.99, f"view {i} agreement {a}"

    def test_full_with_cross_check(self, rng):
        cams, ocams, rgbs, masks = make_rig(rng, n=3)
        got = mvs_depth_maps(rgbs, masks, cams, CFG, cross_check=True,
                             method="exact", dtype=jnp.float64)
        neighbours = select_neighbours(cams, CFG)
        want = [orc.oracle_mvs_oneview(rgbs, masks, ocams, i,
                                       neighbours[i], CFG)
                for i in range(3)]
        want = orc.oracle_mvs_cross_check(want, ocams, CFG)
        for i in range(3):
            a = depth_agreement(got[i], want[i])
            assert a > 0.99, f"view {i} agreement {a}"


class TestNativeMVSOracle:
    """C++ MVS oracle (runtime/native/twoview_oracle.cpp
    mvs_depth_maps_native) == scalar Python oracle, bit-level — the
    native golden/baseline generator for the MVS bench arm (VERDICT r2
    item 2) must carry the exact reference semantics."""

    def test_matches_scalar_oracle(self, rng):
        from stereoreconstruction_tpu.runtime.native import (
            mvs_depth_maps_native)
        cams, ocams, rgbs, masks = make_rig(rng, n=3)
        neighbours = select_neighbours(cams, CFG)

        want = [orc.oracle_mvs_oneview(rgbs, masks, ocams, i,
                                       neighbours[i], CFG)
                for i in range(3)]
        want = np.stack(orc.oracle_mvs_cross_check(want, ocams, CFG))
        got = mvs_depth_maps_native(rgbs, masks, cams, neighbours, CFG,
                                    cross_check=True)
        same = ((np.isnan(got) & np.isnan(want))
                | (np.isinf(got) & np.isinf(want))
                | (np.isfinite(got) & np.isfinite(want)
                   & np.isclose(got, np.where(np.isfinite(want), want,
                                              0.0), atol=1e-9)))
        assert same.mean() == 1.0, f"{1 - same.mean():.4f} differ"
