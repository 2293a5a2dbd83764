"""Refraction calibration: synthetic ground-truth recovery + LM behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereoreconstruction_tpu.config import RefractionConfig
from stereoreconstruction_tpu.geometry import make_camera, project
from stereoreconstruction_tpu.calib.refraction import (
    calibrate,
    default_model,
    make_residual_fn,
    total_error,
)
from stereoreconstruction_tpu.optim.lm import lm_optimize


def norm(v):
    return v / np.linalg.norm(v)


def make_refractive_rig(rng, n_index=1.333):
    """Two refractive cameras with known interfaces + correspondences from
    projected 3D points."""
    K = np.array([[800.0, 0, 320.0], [0, 800.0, 240.0], [0, 0, 1]])
    th = 0.15
    R2 = np.array([[np.cos(th), 0, np.sin(th)],
                   [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]])
    t2 = np.array([-40.0, 0.0, 6.0])

    # true interface params, expressed in the px/py parametrization
    px1, py1, d1 = 324.0, 244.0, 8.0
    px2, py2, d2 = 317.0, 235.0, 9.5

    def plane_normal(K, px, py):
        return norm(np.linalg.solve(K, np.array([px, py, 1.0])))

    cam1 = make_camera(K, np.eye(3), np.zeros(3),
                       plane_normal=plane_normal(K, px1, py1), plane_dist=d1,
                       refr_index=n_index)
    cam2 = make_camera(K, R2, t2,
                       plane_normal=plane_normal(K, px2, py2), plane_dist=d2,
                       refr_index=n_index)

    # 3D points in front of both cameras
    X = rng.uniform([-80, -60, 350], [80, 60, 650], size=(60, 3))
    xy1, v1 = project(cam1, jnp.asarray(X))
    xy2, v2 = project(cam2, jnp.asarray(X))
    good = (np.asarray(v1) & np.asarray(v2)
            & np.all(np.abs(np.asarray(xy1) - [320, 240]) < [310, 230], -1)
            & np.all(np.abs(np.asarray(xy2) - [320, 240]) < [310, 230], -1))
    p1 = np.asarray(xy1)[good]
    p2 = np.asarray(xy2)[good]
    vi1 = np.zeros(len(p1), np.int32)
    vi2 = np.ones(len(p1), np.int32)
    truth = np.array([n_index, px1, py1, d1, px2, py2, d2])
    return [cam1, cam2], p1, p2, vi1, vi2, truth


class TestResidual:
    def test_zero_at_truth(self, rng):
        cams, p1, p2, vi1, vi2, truth = make_refractive_rig(rng)
        assert len(p1) >= 20
        fn = make_residual_fn(cams, p1, p2, vi1, vi2)
        r = np.asarray(fn(jnp.asarray(truth)))
        # at the true interface, rays should (nearly) intersect
        assert np.abs(r).max() < 1e-4

    def test_nonzero_off_truth(self, rng):
        cams, p1, p2, vi1, vi2, truth = make_refractive_rig(rng)
        fn = make_residual_fn(cams, p1, p2, vi1, vi2)
        wrong = truth.copy()
        wrong[0] = 1.0 + 1e-9  # nearly non-refractive
        wrong[3] = 1e-9
        r = np.asarray(fn(jnp.asarray(wrong)))
        assert np.abs(r).mean() > 0.5  # pixels of mismatch


class TestCalibrate:
    def test_recovers_interface(self, rng):
        cams, p1, p2, vi1, vi2, truth = make_refractive_rig(rng)
        model0 = truth.copy()
        # perturb: wrong index, wrong distances, principal-point normals
        model0[0] = 1.30
        model0[1:] = [320.0, 240.0, 6.0, 320.0, 240.0, 7.0]
        res = calibrate(cams, p1, p2, vi1, vi2, model0=model0,
                        cfg=RefractionConfig(epsilon=1e-8))
        assert res.ok
        assert res.chi2_after < res.chi2_before * 1e-3
        # interface distances and index recovered to reasonable accuracy
        assert abs(res.refractive_index - truth[0]) < 0.02
        assert abs(res.model[3] - truth[3]) < 0.5
        assert abs(res.model[6] - truth[6]) < 0.5

    def test_fixed_mask_respected(self, rng):
        cams, p1, p2, vi1, vi2, truth = make_refractive_rig(rng)
        model0 = truth.copy()
        model0[0] = 1.30
        fixed = np.zeros(7, bool)
        fixed[4:7] = True  # freeze view 2's interface
        res = calibrate(cams, p1, p2, vi1, vi2, model0=model0, fixed=fixed,
                        cfg=RefractionConfig(epsilon=1e-8))
        np.testing.assert_array_equal(res.model[4:7], model0[4:7])

    def test_total_error_api(self, rng):
        cams, p1, p2, vi1, vi2, truth = make_refractive_rig(rng)
        total, avg = total_error(cams, truth, p1, p2, vi1, vi2)
        assert total < 1e-6
        wrong = truth.copy()
        wrong[3] += 3.0
        total2, _ = total_error(cams, wrong, p1, p2, vi1, vi2)
        assert total2 > total


class TestLMGeneric:
    def test_curve_fit(self, rng):
        # property test: LM fits an exponential-decay curve
        xs = np.linspace(0, 4, 40)
        true = np.array([2.5, 1.3])
        ys = true[0] * np.exp(-true[1] * xs) + rng.normal(0, 1e-3, 40)

        def residuals(m):
            return m[0] * jnp.exp(-m[1] * jnp.asarray(xs)) - jnp.asarray(ys)

        res = lm_optimize(residuals, np.array([1.0, 0.5]),
                          max_iterations=100, epsilon=1e-12)
        np.testing.assert_allclose(res.model, true, atol=5e-3)
        assert res.chi2 < res.initial_chi2

    def test_rejection_keeps_model_valid(self, rng):
        def residuals(m):
            return jnp.asarray([m[0] ** 2 - 2.0, m[0] - 1.4])

        res = lm_optimize(residuals, np.array([5.0]),
                          validate_fn=lambda m: bool(m[0] > 0),
                          max_iterations=50, epsilon=1e-12)
        assert res.model[0] > 0
