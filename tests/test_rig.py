"""End-to-end rig calibration + bundle adjustment on a synthetic rig."""

import dataclasses

import numpy as np
import pytest

from stereoreconstruction_tpu.config import CalibrationConfig
from stereoreconstruction_tpu.calib.rig import (
    CameraCalibration, RigCalibrationState, board_object_points)
from stereoreconstruction_tpu.calib.bundle import bundle_adjust
from stereoreconstruction_tpu.calib.zhang import rodrigues, rodrigues_inv

from test_calib import project_points


CFG = CalibrationConfig(board_cols=7, board_rows=5, cell_size=11.0,
                        num_iterations=2, min_subset=6)


def synth_rig(rng, n_cams=3, n_sets=10, noise=0.0):
    """Convergent rig + boards at varying poses; returns observations and
    ground truth."""
    obj = board_object_points(CFG)
    Ks = [np.array([[700.0 + 30 * i, 0, 500.0 + 5 * i],
                    [0, 690.0 + 25 * i, 380.0 - 4 * i],
                    [0, 0, 1.0]]) for i in range(n_cams)]
    dists = [np.zeros(5) for _ in range(n_cams)]

    cam_R, cam_t = [], []
    for i in range(n_cams):
        ang = (i - (n_cams - 1) / 2) * 0.25
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        C = np.array([-np.sin(ang) * 500.0, 0.0,
                      -(500.0 - np.cos(ang) * 500.0)])
        cam_R.append(R)
        cam_t.append(R @ -C)

    image_points = [[None] * n_sets for _ in range(n_cams)]
    for s in range(n_sets):
        w = rng.normal(0, 0.4, 3)
        Rb = np.asarray(rodrigues(w))
        tb = np.array([rng.uniform(-80, 20), rng.uniform(-60, 20),
                       rng.uniform(420, 620)])
        for ci in range(n_cams):
            R = cam_R[ci] @ Rb
            t = cam_R[ci] @ tb + cam_t[ci]
            pts = project_points(Ks[ci], dists[ci], R, t, obj)
            if noise:
                pts = pts + rng.normal(0, noise, pts.shape)
            # visibility: boards must project inside a 1024x768 image
            if np.all((pts > 0) & (pts < [1024, 768])):
                image_points[ci][s] = pts
    return image_points, Ks, cam_R, cam_t, obj


class TestRigCalibration:
    def test_recovers_rig(self, rng):
        image_points, Ks, cam_R, cam_t, obj = synth_rig(rng, noise=0.05)
        calib = CameraCalibration(image_points,
                                  [(1024, 768)] * 3, CFG)
        res = calib.calibrate()
        assert np.isfinite(res.error)
        assert res.error < 0.3   # mean reprojection error (px)

        # intrinsics close to truth
        for i in range(3):
            np.testing.assert_allclose(res.state.K[i][0, 0], Ks[i][0, 0],
                                       rtol=0.02)

        # relative geometry: camera centers up to global similarity.
        # Reference frame camera has identity pose; compare pairwise
        # center distances ratios.
        def centers(Rs, ts):
            return np.stack([-R.T @ t for R, t in zip(Rs, ts)])

        C_true = centers(cam_R, cam_t)
        C_got = centers(res.state.R, res.state.t)
        d_true = np.linalg.norm(C_true[1:] - C_true[:-1], axis=1)
        d_got = np.linalg.norm(C_got[1:] - C_got[:-1], axis=1)
        np.testing.assert_allclose(d_got, d_true, rtol=0.02)

    def test_compute_error_sane(self, rng):
        image_points, Ks, cam_R, cam_t, obj = synth_rig(rng)
        calib = CameraCalibration(image_points, [(1024, 768)] * 3, CFG)
        truth = RigCalibrationState(
            K=[k.copy() for k in Ks], dist=[np.zeros(5)] * 3,
            R=[r.copy() for r in cam_R], t=[t.copy() for t in cam_t])
        err = calib.compute_error(truth)
        assert err < 1e-6
        # NOTE: a shift along the baseline keeps two-view rays consistent
        # (points re-triangulate at a different depth); a perpendicular
        # shift breaks the epipolar geometry and must show up as error.
        bad = truth.copy()
        bad.t[1] = bad.t[1] + np.array([0.0, 5.0, 0])
        assert calib.compute_error(bad) > err + 0.1


class TestBundleAdjust:
    def test_reduces_reprojection_error(self, rng):
        n_cams, n_pts = 4, 60
        Ks = np.stack([np.array([[800.0, 0, 512], [0, 800.0, 384],
                                 [0, 0, 1]])] * n_cams)
        true_poses = []
        for i in range(n_cams):
            ang = i * 0.15
            R = np.array([[np.cos(ang), 0, np.sin(ang)],
                          [0, 1, 0],
                          [-np.sin(ang), 0, np.cos(ang)]])
            t = np.array([-40.0 * i, 2.0 * i, 10.0 * i])
            true_poses.append(np.concatenate([rodrigues_inv(R), t]))
        true_poses = np.stack(true_poses)
        X = rng.uniform([-150, -100, 500], [150, 100, 900], (n_pts, 3))

        cam_idx, pt_idx, meas = [], [], []
        for v in range(n_cams):
            R = np.asarray(rodrigues(true_poses[v, :3]))
            t = true_poses[v, 3:]
            p = X @ R.T + t
            uv = (p @ Ks[v].T)
            uv = uv[:, :2] / uv[:, 2:]
            for j in range(n_pts):
                cam_idx.append(v)
                pt_idx.append(j)
                meas.append(uv[j])

        poses0 = true_poses + rng.normal(0, 0.01, true_poses.shape)
        poses0[0] = true_poses[0]          # gauge fixed
        X0 = X + rng.normal(0, 2.0, X.shape)

        poses, points, hist = bundle_adjust(
            Ks, poses0, X0, np.asarray(cam_idx), np.asarray(pt_idx),
            np.asarray(meas))
        assert hist[-1] < hist[0] * 1e-6
        # first camera sits at the origin, so a global-scale gauge freedom
        # remains: compare after scale alignment
        s = float(np.sum(points * X) / np.sum(points * points))
        np.testing.assert_allclose(s * points, X, atol=1e-3)
        np.testing.assert_allclose(poses[:, :3], true_poses[:, :3],
                                   atol=1e-5)
        np.testing.assert_allclose(s * poses[:, 3:], true_poses[:, 3:],
                                   atol=1e-3)


class TestOutlierRejection:
    """Trimmed refit in calibrate_camera/stereo_calibrate: misdetected or
    180-degree-flipped boards must not poison the solve."""

    def test_rig_survives_flipped_board(self, rng):
        image_points, Ks, cam_R, cam_t, obj = synth_rig(rng, noise=0.05)
        # flip one board's corner indexing in ONE camera only — this is the
        # classic failure the reference fixes by hand via rotateIndicies
        # (checkerboard.cpp:96-120)
        flipped = False
        for s in range(len(image_points[1])):
            if image_points[1][s] is not None:
                image_points[1][s] = image_points[1][s][::-1].copy()
                flipped = True
                break
        assert flipped
        # and one pure-garbage detection in another camera
        for s in range(len(image_points[2]) - 1, -1, -1):
            if image_points[2][s] is not None:
                image_points[2][s] = rng.uniform(
                    0, 700, image_points[2][s].shape)
                break
        calib = CameraCalibration(image_points, [(1024, 768)] * 3, CFG)
        res = calib.calibrate()
        assert res.error < 1.0, res.error

    def test_stereo_calibrate_drops_flipped_view(self, rng):
        from stereoreconstruction_tpu.calib.zhang import stereo_calibrate
        image_points, Ks, cam_R, cam_t, obj = synth_rig(
            rng, n_cams=2, noise=0.05)
        v1, v2 = [], []
        for a, b in zip(image_points[0], image_points[1]):
            if a is not None and b is not None:
                v1.append(a)
                v2.append(b)
        assert len(v1) >= 6
        v2[2] = v2[2][::-1].copy()           # flipped in the right view
        res = stereo_calibrate(obj, v1, v2, Ks[0], np.zeros(5),
                               Ks[1], np.zeros(5))
        R_true = cam_R[1] @ cam_R[0].T
        np.testing.assert_allclose(res.R, R_true, atol=2e-3)
        assert res.rms < 1.0
