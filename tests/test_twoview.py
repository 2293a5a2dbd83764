"""Engine-vs-oracle parity tests for the two-view stereo pipeline on small
synthetic scenes (both pinhole and refractive)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from stereoreconstruction_tpu.config import TwoViewConfig, WeightConfig
from stereoreconstruction_tpu.geometry import make_camera
from stereoreconstruction_tpu.ops.weights import geodesic_weights
from stereoreconstruction_tpu.stereo.twoview import (
    compute_depth_maps,
)

import oracle as orc


def smooth_image(rng, h, w):
    """Smooth random RGB image in 0..255 (correlated so NCC has structure)."""
    img = rng.normal(size=(h + 8, w + 8, 3))
    # box blur via summed-area table
    acc = np.cumsum(np.cumsum(img, axis=0), axis=1)
    out = (acc[8:, 8:] - acc[:-8, 8:] - acc[8:, :-8] + acc[:-8, :-8]) / 64.0
    out = out[:h, :w]
    out = (out - out.min()) / (np.ptp(out) + 1e-9) * 255.0
    return out


def make_scene(rng, refractive=False, h=20, w=26):
    rgb_l = smooth_image(rng, h, w)
    rgb_r = smooth_image(rng, h, w)
    mask_l = np.ones((h, w), bool)
    mask_r = np.ones((h, w), bool)
    mask_l[2:4, 5:9] = False  # some masked-out patches
    mask_r[10:12, 1:4] = False

    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]])
    th = 0.05
    R_r = np.array([[np.cos(th), 0, np.sin(th)],
                    [0, 1, 0],
                    [-np.sin(th), 0, np.cos(th)]])
    t_r = np.array([-8.0, 0.5, 1.0])

    kw = {}
    if refractive:
        kw = dict(plane_normal=np.array([0.02, -0.01, 1.0]),
                  plane_dist=2.0, refr_index=1.333)

    cam_l = make_camera(K, np.eye(3), np.zeros(3), **kw)
    cam_r = make_camera(K, R_r, t_r, **kw)

    ocam_l = orc.OracleCamera(K, np.eye(3), np.zeros(3), **kw)
    ocam_r = orc.OracleCamera(K, R_r, t_r, **kw)
    return rgb_l, mask_l, rgb_r, mask_r, cam_l, cam_r, ocam_l, ocam_r


CFG = TwoViewConfig(
    window_radius=2,
    min_depth=40.0,
    max_depth=90.0,
    num_depth_levels=6,
    image_scale=1.0,
    weights=WeightConfig(kind="geodesic"),
)


def depth_agreement(got, want):
    """Fraction of pixels whose sentinel class and value agree."""
    got = np.asarray(got)
    same_nan = np.isnan(got) & np.isnan(want)
    same_inf = np.isinf(got) & np.isinf(want)
    both_fin = np.isfinite(got) & np.isfinite(want)
    with np.errstate(invalid="ignore"):
        close = both_fin & (np.abs(got - want) < 1e-6)
    return (same_nan | same_inf | close).mean()


class TestGeodesicWeights:
    def test_matches_oracle(self, rng):
        rgb = smooth_image(rng, 12, 14)
        radius = 2
        w_all = np.asarray(geodesic_weights(jnp.asarray(rgb), radius))
        # w_all: [S, S, H, W]
        for (cy, cx) in [(5, 6), (0, 0), (11, 13), (2, 10)]:
            expect = orc.oracle_geodesic_weights(rgb, cx, cy, radius)
            got = w_all[:, :, cy, cx]
            np.testing.assert_allclose(got, expect, atol=1e-9,
                                       err_msg=f"center ({cy},{cx})")


class TestTwoViewParity:
    @pytest.mark.parametrize("refractive", [False, True])
    def test_depth_map_matches_oracle(self, rng, refractive):
        (rgb_l, mask_l, rgb_r, mask_r,
         cam_l, cam_r, ocam_l, ocam_r) = make_scene(rng, refractive)

        res = compute_depth_maps(rgb_l, mask_l, rgb_r, mask_r,
                                 cam_l, cam_r, CFG, cross_check=False,
                                 method="exact", dtype=jnp.float64)

        want_l = orc.oracle_depth_map_oneview(
            rgb_l, mask_l, rgb_r, mask_r, ocam_l, ocam_r, CFG)
        want_r = orc.oracle_depth_map_oneview(
            rgb_r, mask_r, rgb_l, mask_l, ocam_r, ocam_l, CFG)

        agree_l = depth_agreement(res.depth_left, want_l)
        agree_r = depth_agreement(res.depth_right, want_r)
        assert agree_l > 0.995, f"left agreement {agree_l}"
        assert agree_r > 0.995, f"right agreement {agree_r}"

    def test_cross_check_matches_oracle(self, rng):
        (rgb_l, mask_l, rgb_r, mask_r,
         cam_l, cam_r, ocam_l, ocam_r) = make_scene(rng, False)

        res = compute_depth_maps(rgb_l, mask_l, rgb_r, mask_r,
                                 cam_l, cam_r, CFG, cross_check=True,
                                 method="exact", dtype=jnp.float64)

        wl = orc.oracle_depth_map_oneview(
            rgb_l, mask_l, rgb_r, mask_r, ocam_l, ocam_r, CFG)
        wr = orc.oracle_depth_map_oneview(
            rgb_r, mask_r, rgb_l, mask_l, ocam_r, ocam_l, CFG)
        wl, wr = orc.oracle_cross_check(wl, wr, ocam_l, ocam_r, CFG)

        assert depth_agreement(res.depth_left, wl) > 0.99
        assert depth_agreement(res.depth_right, wr) > 0.99

    def test_masked_pixels_are_nan(self, rng):
        (rgb_l, mask_l, rgb_r, mask_r,
         cam_l, cam_r, _, _) = make_scene(rng, False)
        res = compute_depth_maps(rgb_l, mask_l, rgb_r, mask_r,
                                 cam_l, cam_r, CFG, cross_check=False,
                                 method="exact", dtype=jnp.float64)
        d = np.asarray(res.depth_left)
        assert np.all(np.isnan(d[~mask_l]))
