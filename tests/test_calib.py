"""Calibration primitives: homography, Zhang intrinsics, camera + stereo
calibration on synthetic ground truth, triangulation, Floyd-Warshall."""

import numpy as np
import pytest

from stereoreconstruction_tpu.calib.zhang import (
    find_homography,
    zhang_intrinsics,
    extrinsics_from_homography,
    calibrate_camera,
    stereo_calibrate,
    rodrigues,
    rodrigues_inv,
)
from stereoreconstruction_tpu.calib.badata import triangulate
from stereoreconstruction_tpu.calib.floydwarshall import FloydWarshall


TRUE_K = np.array([[900.0, 0, 510.0], [0, 890.0, 390.0], [0, 0, 1.0]])
TRUE_DIST = np.array([-0.15, 0.08, 0.001, -0.002, 0.0])


def board_points(cols=11, rows=9, cell=11.0):
    pts = []
    for r in range(rows):
        for c in range(cols):
            pts.append([cell * c, cell * r, 0.0])
    return np.asarray(pts)


def rot(rng, scale=0.35):
    w = rng.normal(0, scale, 3)
    return np.asarray(rodrigues(w)), w


def project_points(K, dist, R, t, X):
    p = X @ R.T + t
    x = p[:, 0] / p[:, 2]
    y = p[:, 1] / p[:, 2]
    r2 = x * x + y * y
    k = dist
    cdist = 1 + ((k[4] * r2 + k[1]) * r2 + k[0]) * r2
    xd = x * cdist + 2 * k[2] * x * y + k[3] * (r2 + 2 * x * x)
    yd = y * cdist + k[2] * (r2 + 2 * y * y) + 2 * k[3] * x * y
    return np.stack([K[0, 0] * xd + K[0, 2], K[1, 1] * yd + K[1, 2]], -1)


def synth_views(rng, n_views=8, dist=TRUE_DIST):
    obj = board_points()
    views = []
    poses = []
    for _ in range(n_views):
        R, _ = rot(rng)
        t = np.array([rng.uniform(-60, 0), rng.uniform(-50, 0),
                      rng.uniform(350, 550)])
        views.append(project_points(TRUE_K, dist, R, t, obj))
        poses.append((R, t))
    return obj, views, poses


class TestRodrigues:
    def test_roundtrip(self, rng):
        for _ in range(10):
            w = rng.normal(0, 1, 3)
            R = np.asarray(rodrigues(w))
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
            np.testing.assert_allclose(rodrigues_inv(R), w, atol=1e-9)


class TestHomography:
    def test_exact(self, rng):
        obj, views, poses = synth_views(rng, n_views=1,
                                        dist=np.zeros(5))
        H = find_homography(obj[:, :2], views[0])
        src = np.hstack([obj[:, :2], np.ones((len(obj), 1))])
        proj = src @ H.T
        proj = proj[:, :2] / proj[:, 2:]
        np.testing.assert_allclose(proj, views[0], atol=1e-8)

    def test_extrinsics_recovery(self, rng):
        obj, views, poses = synth_views(rng, n_views=1, dist=np.zeros(5))
        H = find_homography(obj[:, :2], views[0])
        R, t = extrinsics_from_homography(TRUE_K, H)
        np.testing.assert_allclose(R, poses[0][0], atol=1e-6)
        np.testing.assert_allclose(t, poses[0][1], atol=1e-4)


class TestZhang:
    def test_intrinsics_closed_form(self, rng):
        obj, views, _ = synth_views(rng, n_views=6, dist=np.zeros(5))
        Hs = [find_homography(obj[:, :2], v) for v in views]
        K = zhang_intrinsics(Hs)
        np.testing.assert_allclose(K, TRUE_K, rtol=1e-5, atol=0.3)

    def test_calibrate_camera_distorted(self, rng):
        obj, views, _ = synth_views(rng, n_views=10)
        res = calibrate_camera(obj, views, (1024, 768))
        assert res.rms < 1e-6
        np.testing.assert_allclose(res.K, TRUE_K, rtol=1e-4, atol=0.3)
        np.testing.assert_allclose(res.dist, TRUE_DIST, atol=1e-4)

    def test_calibrate_with_noise(self, rng):
        obj, views, _ = synth_views(rng, n_views=12)
        noisy = [v + rng.normal(0, 0.2, v.shape) for v in views]
        res = calibrate_camera(obj, noisy, (1024, 768))
        assert res.rms < 0.4
        np.testing.assert_allclose(res.K[0, 0], TRUE_K[0, 0], rtol=5e-3)
        np.testing.assert_allclose(res.K[:2, 2], TRUE_K[:2, 2], atol=4.0)


class TestStereoCalibrate:
    def test_relative_pose(self, rng):
        obj = board_points()
        Rrel, _ = rot(rng, 0.15)
        trel = np.array([-30.0, 2.0, 4.0])
        K2 = TRUE_K + np.diag([25, -12, 0.0])
        views1, views2 = [], []
        for _ in range(8):
            R1, _ = rot(rng)
            t1 = np.array([rng.uniform(-60, 0), rng.uniform(-50, 0),
                           rng.uniform(350, 550)])
            R2 = Rrel @ R1
            t2 = Rrel @ t1 + trel
            views1.append(project_points(TRUE_K, TRUE_DIST, R1, t1, obj))
            views2.append(project_points(K2, np.zeros(5), R2, t2, obj))
        res = stereo_calibrate(obj, views1, views2, TRUE_K, TRUE_DIST,
                               K2, np.zeros(5))
        assert res.rms < 1e-6
        np.testing.assert_allclose(res.R, Rrel, atol=1e-7)
        np.testing.assert_allclose(res.t, trel, atol=1e-5)


class TestTriangulate:
    def test_two_view(self, rng):
        K = TRUE_K
        R2, _ = rot(rng, 0.2)
        t2 = np.array([-25.0, 1.0, 3.0])
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = K @ np.hstack([R2, t2[:, None]])
        X = rng.uniform([-50, -40, 300], [50, 40, 600], (20, 3))
        for i in range(20):
            x1 = P1 @ np.append(X[i], 1)
            x2 = P2 @ np.append(X[i], 1)
            got = triangulate([P1, P2], [x1[:2] / x1[2], x2[:2] / x2[2]])
            np.testing.assert_allclose(got, X[i], atol=1e-6)


class TestFloydWarshall:
    def test_paths(self):
        inf = np.inf
        g = np.array([[0, 1, inf, 10],
                      [1, 0, 2, inf],
                      [inf, 2, 0, 3],
                      [10, inf, 3, 0.0]])
        fw = FloydWarshall(g)
        assert fw.cost(0, 3) == 6          # 0-1-2-3
        assert fw.path(0, 3) == [0, 1, 2, 3]
        assert fw.cost(0, 2) == 3
        assert fw.path(2, 0) == [2, 1, 0]
