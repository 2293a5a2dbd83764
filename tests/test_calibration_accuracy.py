"""Calibration-accuracy loop closed with asserted bounds (VERDICT r1
item 6).

Fixture: tests/golden/example_corners.npz — our checkerboard detections
over the 240 example images (101 full boards; the remainder do not show
the complete board, per the committed audit docs/calibration_audit.json).
Both calibrations are scored with the reference's own metric — mean
pairwise triangulated-corner reprojection error (calibrate.cpp:284-329,
calib.rig.CameraCalibration.board_errors).

Measured on the full fixture (docs/calibration_audit.json):
  shipped calibration on our corners: median 0.395 px
  own full calibration:               inlier mean 0.396 px (median 0.363)
— i.e. our from-scratch pipeline reaches the shipped calibration's error
band on identical input.  The test runs a reduced RANSAC budget on a
subset of sets to stay fast; bounds are set accordingly.
"""

import os

import numpy as np
import pytest

from conftest import example_project_available

needs_example = pytest.mark.skipif(not example_project_available(),
                                   reason="example project not mounted")

CORNERS = os.path.join(os.path.dirname(__file__), "golden",
                       "example_corners.npz")


@pytest.fixture(scope="module")
def fixture():
    from stereoreconstruction_tpu.data.project_io import load_project
    data = np.load(CORNERS, allow_pickle=True)
    proj = load_project("/root/reference/example/project.xml")
    cam_ids = sorted(proj.cameras)
    set_ids = sorted({k.split("|")[0] for k in data.files
                      if "|" in k})
    sizes = {row[0]: (int(row[1]), int(row[2]))
             for row in data["__sizes__"]}
    pts = [[data[f"{s}|{c}"] if f"{s}|{c}" in data.files else None
            for s in set_ids] for c in cam_ids]
    return proj, cam_ids, set_ids, pts, [sizes[c] for c in cam_ids]


@needs_example
def test_shipped_calibration_error_band_on_our_corners(fixture):
    """Validates detector + corner ordering + the error metric: with the
    shipped projection matrices, our detected corners triangulate to
    sub-pixel median error."""
    from stereoreconstruction_tpu.config import CalibrationConfig
    from stereoreconstruction_tpu.calib.rig import (
        CameraCalibration, RigCalibrationState)

    proj, cam_ids, set_ids, pts, sizes = fixture
    calib = CameraCalibration(pts, sizes, CalibrationConfig())
    state = RigCalibrationState.identity(len(cam_ids))
    for i, cid in enumerate(cam_ids):
        K, R, t, _ = proj.cameras[cid].decompose()
        state.K[i], state.R[i], state.t[i] = K, R, t
        state.dist[i] = proj.cameras[cid].dist
    errs = np.array(list(calib.board_errors(state).values()))
    assert len(errs) > 100
    med = float(np.median(errs))
    assert med < 0.6, f"shipped-calibration median {med} px"


@needs_example
def test_own_calibration_reaches_shipped_band(fixture):
    """Full from-scratch rig calibration (Zhang + pairwise LM + FW
    chaining + pruning) on the same corners, reduced budget: the inlier
    mean must stay within the shipped calibration's error band (< 1.0 px;
    full-budget run measures 0.396 px vs shipped median 0.395)."""
    import dataclasses
    from stereoreconstruction_tpu.config import CalibrationConfig
    from stereoreconstruction_tpu.calib.rig import CameraCalibration

    proj, cam_ids, set_ids, pts, sizes = fixture
    # subset of sets + fewer RANSAC iterations to keep the test fast
    keep = [s for s in range(len(set_ids))
            if sum(pts[c][s] is not None
                   for c in range(len(cam_ids))) >= 2][:12]
    pts_sub = [[p[s] for s in keep] for p in pts]
    cfg = CalibrationConfig(num_iterations=1, min_subset=8)
    calib = CameraCalibration(pts_sub, sizes, cfg)
    res = calib.calibrate()
    assert np.isfinite(res.error)
    # this reduced-budget run measures 0.498 px (deterministic, seeded
    # RANSAC); bound tightened from 1.0 per VERDICT r2 item 9 with a
    # small margin for cross-platform fp drift
    assert res.error < 0.55, f"own calibration inlier mean {res.error} px"
