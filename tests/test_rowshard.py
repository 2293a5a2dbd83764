"""Row-sharded engine == unsharded fast engine (bit-level).

The explicit shard_map partition (parallel/rowshard.py) must reproduce the
single-device fast path exactly: blocks compute global-coordinate rays,
weights and validity, so only the partitioning differs.  Runs on the
8-device virtual CPU mesh (conftest).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereoreconstruction_tpu.config import TwoViewConfig, WeightConfig
from stereoreconstruction_tpu.parallel.rowshard import (
    make_mesh, stack_cameras, twoview_pairs_rowsharded, overlap_blocks)
from stereoreconstruction_tpu.stereo.twoview import compute_depth_maps

from synth import converging_rig, render_scene


CFG = TwoViewConfig(window_radius=2, min_depth=45.0, max_depth=80.0,
                    num_depth_levels=12, image_scale=1.0,
                    weights=WeightConfig(kind="geodesic"))


def same_maps(got, want, what):
    got, want = np.asarray(got), np.asarray(want)
    same = ((np.isnan(got) & np.isnan(want))
            | (np.isinf(got) & np.isinf(want))
            | (np.isfinite(got) & np.isfinite(want)
               & np.isclose(got, np.where(np.isfinite(want), want, 0.0),
                            atol=1e-5)))
    assert same.mean() == 1.0, f"{what}: {1 - same.mean():.4f} differ"


class TestOverlapBlocks:
    def test_roundtrip(self):
        x = np.arange(7 * 5, dtype=np.float64).reshape(7, 5)
        b = overlap_blocks(x, 2, halo=2)
        assert b.shape == (2, 8, 5)
        # centers reassemble to the padded image
        centers = b[:, 2:-2].reshape(-1, 5)[:7]
        np.testing.assert_array_equal(centers, x)


class TestRowSharded:
    @pytest.mark.parametrize("mesh_shape,cross_check", [
        ((2, 4), True),
        ((1, 8), False),
        ((2, 4), False),
    ])
    def test_matches_unsharded(self, mesh_shape, cross_check):
        n_view, n_row = mesh_shape
        if len(jax.devices()) < n_view * n_row:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(n_view, n_row)

        # two distinct pairs (different plane depths) so the view axis is
        # exercised with real data-parallel content
        cams = converging_rig(2)
        pairs = []
        for pd, seed in ((58.0, 0), (66.0, 1))[:n_view] * \
                (1 if n_view > 1 else 1):
            rgbs, masks, _ = render_scene(cams, 64, 80, plane_dist=pd,
                                          seed=seed,
                                          enable_refraction=False)
            pairs.append((rgbs, masks))
        while len(pairs) < n_view:
            pairs.append(pairs[0])

        rgbs_l = np.stack([p[0][0] for p in pairs])
        rgbs_r = np.stack([p[0][1] for p in pairs])
        masks_l = np.stack([p[1][0] for p in pairs])
        masks_r = np.stack([p[1][1] for p in pairs])
        # punch mask holes so the mask path is nontrivial
        masks_l[:, 10:14, 20:30] = False
        masks_r[:, 40:44, 5:15] = False
        cams_l = stack_cameras([cams[0]] * n_view)
        cams_r = stack_cameras([cams[1]] * n_view)

        dl, dr = twoview_pairs_rowsharded(
            mesh, rgbs_l, masks_l, rgbs_r, masks_r, cams_l, cams_r, CFG,
            cross_check=cross_check, enable_refraction=False)

        for p in range(n_view):
            want = compute_depth_maps(
                rgbs_l[p], masks_l[p], rgbs_r[p], masks_r[p],
                cams[0], cams[1], CFG, cross_check=cross_check,
                method="fast", enable_refraction=False,
                dtype=jnp.float32)
            same_maps(dl[p], want.depth_left, f"pair{p} left")
            same_maps(dr[p], want.depth_right, f"pair{p} right")
