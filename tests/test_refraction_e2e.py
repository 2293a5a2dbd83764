"""End-to-end refractive pipeline through IMAGES (VERDICT r1 item 7).

The thesis workflow (StereoWidget -> RefractionCalibration,
refractioncalibration.cpp:289-404): a multi-camera rig images checkerboards
through flat refractive ports; corners are detected per image, matched by
corner index across views, and the interface (normal piercing pixel +
distance per camera + shared index) is calibrated by LM on the
image-space-scaled ray-ray mismatch.  This fixture renders that scenario
synthetically (known interface, n=1.333 ports) and runs the REAL pipeline:
render -> find_chessboard_corners -> index-match -> calibrate -> depth.

Observability notes (documented by the probes that built this test):
* with exact corner correspondences the full model (index + per-view
  normal + distance) is recovered to 4 digits — the parametrization is
  fine; with detected corners the limit is the subpixel corner bias
  (~0.06 px here), which LM absorbs mostly into the interface *distance*
  (sensitivity ~0.03 px per unit) — so the distance tolerance is loose
  while index/normal are tight.
* the depth-scaled residual (refractioncalibration.cpp:175-199) has a
  degenerate direction: index -> inf bends all rays onto the interface
  normal, midpoints race to infinity and residuals -> 0.  The reference
  metric has the same hole; a good initialization (the GUI's spinner
  values, stereowidget.cpp:520-549) keeps LM in the true basin, which is
  what this test reproduces.
"""

import functools
import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from stereoreconstruction_tpu.calib.refraction import (
    calibrate, total_error, _cam_with_model, _stack_cams)
from stereoreconstruction_tpu.config import TwoViewConfig, WeightConfig
from stereoreconstruction_tpu.features.checkerboard import (
    find_chessboard_corners)
from stereoreconstruction_tpu.features.matching import match_checkerboard
from stereoreconstruction_tpu.data.project_io import FeatureRecord
from stereoreconstruction_tpu.stereo.twoview import compute_depth_maps

from synth import converging_rig, render_scene, checkerboard_texture


NV = 4
H, W, F = 120, 160, 250.0
TRUE_N = 1.333
TRUE_DIST = 5.0
COLS, ROWS = 8, 6

BOARDS = [(30.0, (0, 0, 1), (0, 0)), (40.0, (0, 0, 1), (2.0, 1.2)),
          (50.0, (0.15, 0, 1), (-1.6, 0.8)),
          (35.0, (-0.1, 0.1, 1), (1.0, -1.0)),
          (45.0, (0, -0.15, 1), (-0.6, -1.6)),
          (55.0, (0.1, 0.1, 1), (1.8, 0.4))]


@pytest.fixture(scope="module")
def rig():
    return converging_rig(NV, refractive=True, refr_index=TRUE_N,
                          plane_dist=TRUE_DIST, interface_tilt=0.08,
                          h=H, w=W, focal=F, baseline=8.0, target_z=45.0)


@pytest.fixture(scope="module")
def calibrated(rig):
    """Run the full detect -> match -> calibrate pipeline once."""
    gray = lambda im: (0.11 * im[..., 0] + 0.59 * im[..., 1]
                       + 0.3 * im[..., 2])
    P1, P2, V1, V2 = [], [], [], []
    detected = 0
    for si, (pd, pn, ctr) in enumerate(BOARDS):
        pn = np.asarray(pn, float)
        pn /= np.linalg.norm(pn)
        tex = functools.partial(checkerboard_texture, cols=COLS, rows=ROWS,
                                cell=pd / 22.0, center=ctr, sharp=12.0)
        rgbs, _, _ = render_scene(rig, H, W, plane_dist=pd,
                                  plane_normal=pn, texture_fn=tex)
        corners = [find_chessboard_corners(gray(rgbs[v]), COLS, ROWS)
                   for v in range(NV)]
        detected += sum(c is not None for c in corners)
        # match by corner index (the CheckerboardFeature compare rule,
        # checkerboard.cpp:63-71) via the real matcher
        feats = [None if c is None else
                 [FeatureRecord(x=float(x), y=float(y),
                                kind="checkerboard", corner_index=k,
                                image_set_id=str(si))
                  for k, (x, y) in enumerate(c)]
                 for c in corners]
        for a, b in itertools.combinations(range(NV), 2):
            if feats[a] is None or feats[b] is None:
                continue
            for ia, ib in match_checkerboard(feats[a], feats[b]):
                # detector returns array-index coords; rays go through
                # pixel centers -> +0.5 to continuous coordinates
                P1.append(corners[a][ia] + 0.5)
                P2.append(corners[b][ib] + 0.5)
                V1.append(a)
                V2.append(b)

    p1, p2 = np.asarray(P1), np.asarray(P2)
    vi1 = np.asarray(V1, np.int32)
    vi2 = np.asarray(V2, np.int32)

    K = np.asarray(rig[0].K)
    true_model = np.zeros(3 * NV + 1)
    true_model[0] = TRUE_N
    for v, cam in enumerate(rig):
        n = np.asarray(cam.plane_normal)
        p = K @ n
        p /= p[2]
        true_model[3 * v + 1: 3 * v + 4] = (p[0], p[1],
                                            float(cam.plane_dist))

    # GUI-workflow initialization: plausible spinner values (index 1.30,
    # piercing at the principal point, rough distance)
    m0 = np.concatenate([[1.30]] + [[K[0, 2], K[1, 2], 3.0]] * NV)
    res = calibrate(rig, p1, p2, vi1, vi2, model0=m0)
    return dict(res=res, true_model=true_model, p1=p1, p2=p2,
                vi1=vi1, vi2=vi2, detected=detected, m0=m0, K=K)


class TestRefractionThroughImages:
    def test_boards_detected_and_matched(self, calibrated):
        assert calibrated["detected"] >= 5 * NV - 2, calibrated["detected"]
        assert len(calibrated["p1"]) > 1000

    def test_chi2_reaches_truth_floor(self, rig, calibrated):
        c = calibrated
        truth_total, _ = total_error(rig, c["true_model"], c["p1"],
                                     c["p2"], c["vi1"], c["vi2"])
        res = c["res"]
        assert res.chi2_after < 0.35 * res.chi2_before
        # the fit explains the data as well as the true interface does
        assert res.chi2_after <= 1.05 * truth_total

    def test_interface_recovery(self, calibrated):
        res = calibrated["res"]
        true_model = calibrated["true_model"]
        # shared index: measured recovery 1.347 on this fixture
        assert abs(res.refractive_index - TRUE_N) < 0.05, \
            res.refractive_index
        for v in range(NV):
            px, py, dist = res.plane_params(v)
            tpx, tpy, tdist = true_model[3 * v + 1: 3 * v + 4]
            # init is ~36 px off in px (principal point); the tilt must be
            # found.  Measured: within ~10 px.
            assert abs(px - tpx) < 12, (v, px, tpx)
            assert abs(py - tpy) < 6, (v, py, tpy)
            # distance absorbs the corner bias: loose bound (measured
            # 3.3-3.6 vs true 5.0), but the no-refraction collapse
            # (dist -> 0) must not happen
            assert 1.5 < dist < 8.0, (v, dist)

    def test_refraction_modeling_is_load_bearing(self, rig, calibrated):
        """A no-refraction model cannot explain the correspondences."""
        c = calibrated
        K = c["K"]
        nofr = np.concatenate([[1.0]] + [[K[0, 2], K[1, 2], 1.0]] * NV)
        no_total, _ = total_error(rig, nofr, c["p1"], c["p2"],
                                  c["vi1"], c["vi2"])
        assert no_total > 10 * c["res"].chi2_after

    def test_depth_improves_with_refraction_modeling(self, rig,
                                                     calibrated):
        """Two-view depth on a blob scene through the ports: modeling the
        (true) interface must beat ignoring refraction, and the calibrated
        interface must not be worse than ignoring it."""
        rgbs, masks, true_d = render_scene(
            rig[:2], H, W, plane_dist=40.0, seed=7, n_blobs=600,
            blob_region=16.0)
        cfg = TwoViewConfig(window_radius=2, min_depth=28.0,
                            max_depth=52.0, num_depth_levels=24,
                            image_scale=1.0,
                            weights=WeightConfig(kind="geodesic"))
        stk = _stack_cams([c.astype(jnp.float64) for c in rig])

        def median_err(model, refr):
            cams2 = (rig[:2] if model is None else
                     [_cam_with_model(stk, v, jnp.asarray(model))
                      for v in range(2)])
            r = compute_depth_maps(rgbs[0], masks[0], rgbs[1], masks[1],
                                   cams2[0], cams2[1], cfg,
                                   cross_check=False, method="fast",
                                   enable_refraction=refr,
                                   dtype=jnp.float32)
            d = np.asarray(r.depth_left)
            fin = np.isfinite(d)
            assert fin.mean() > 0.8
            return float(np.median(np.abs(d - true_d[0])[fin]))

        err_true = median_err(calibrated["true_model"], True)
        err_none = median_err(None, False)
        err_cal = median_err(calibrated["res"].model, True)
        # measured: 0.60 (true) vs 1.71 (none) vs 2.0 (calibrated — the
        # distance bias documented in the module docstring costs ~0.3; a
        # diverged calibration measures ~13, which this bound catches)
        assert err_true < 0.6 * err_none, (err_true, err_none)
        assert err_cal < 1.3 * err_none, (err_cal, err_none)
