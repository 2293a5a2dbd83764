"""Unit tests for the geometry core against closed-form cases and the
reference formulas (util/ray.cpp, project/camera.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereoreconstruction_tpu.geometry import (
    closest_points,
    ray_ray_distance,
    ray_midpoint,
    intersect_plane,
    refract_ray,
    make_camera,
    camera_from_P,
    project,
    unproject,
    principal_ray,
)
from stereoreconstruction_tpu.geometry.camera import (
    decompose_P,
    distort,
    undistort,
)
from stereoreconstruction_tpu.geometry.quartic import refraction_radius


def norm(v):
    return v / np.linalg.norm(v)


class TestRays:
    def test_closest_points_intersecting(self):
        # Two rays meeting at (1, 1, 0)
        o1, d1 = jnp.array([0.0, 1, 0]), jnp.array([1.0, 0, 0])
        o2, d2 = jnp.array([1.0, 0, 0]), jnp.array([0.0, 1, 0])
        p1, p2 = closest_points(o1, d1, o2, d2)
        np.testing.assert_allclose(p1, [1, 1, 0], atol=1e-12)
        np.testing.assert_allclose(p2, [1, 1, 0], atol=1e-12)

    def test_closest_points_skew(self):
        # Skew lines: x-axis and the line (0,1,t) — closest distance 1.
        o1, d1 = jnp.array([0.0, 0, 0]), jnp.array([1.0, 0, 0])
        o2, d2 = jnp.array([0.0, 1, -5]), jnp.array([0.0, 0, 1])
        d = ray_ray_distance(o1, d1, o2, d2)
        np.testing.assert_allclose(d, 1.0, atol=1e-12)
        mid = ray_midpoint(o1, d1, o2, d2)
        np.testing.assert_allclose(mid, [0, 0.5, 0], atol=1e-12)

    def test_closest_points_negative_t_clamps_to_source(self):
        # Closest approach behind both sources -> sources returned
        # (ray.cpp:67-73: t<=0 keeps the source).
        o1, d1 = jnp.array([0.0, 0, 0]), jnp.array([1.0, 0, 0])
        o2, d2 = jnp.array([-3.0, 1, 0]), jnp.array([0.0, 0, 1])
        p1, p2 = closest_points(o1, d1, o2, d2)
        np.testing.assert_allclose(p1, o1, atol=1e-12)
        np.testing.assert_allclose(p2, o2, atol=1e-12)

    def test_intersect_plane(self):
        o = jnp.array([0.0, 0, 0])
        d = jnp.array([0.0, 0, 1])
        p, valid = intersect_plane(o, d, jnp.array([0.0, 0, 1.0]),
                                   jnp.asarray(2.0))
        assert bool(valid)
        np.testing.assert_allclose(p, [0, 0, 2], atol=1e-12)

    def test_intersect_plane_parallel_invalid(self):
        o = jnp.array([0.0, 0, 0])
        d = jnp.array([1.0, 0, 0])
        _, valid = intersect_plane(o, d, jnp.array([0.0, 0, 1.0]),
                                   jnp.asarray(2.0))
        assert not bool(valid)

    def test_refract_straight_through(self):
        o = jnp.array([0.0, 0, 0])
        d = jnp.array([0.0, 0, 1])
        n = jnp.array([0.0, 0, 1.0])
        oo, dd, ok = refract_ray(o, d, n, jnp.asarray(1.0), jnp.asarray(1.33))
        assert bool(ok)
        np.testing.assert_allclose(oo, [0, 0, 1], atol=1e-12)
        np.testing.assert_allclose(dd, [0, 0, 1], atol=1e-12)

    def test_refract_snell_law(self):
        # Oblique incidence: verify sin(theta_i) = n * sin(theta_t).
        n_ratio = 1.33
        theta_i = np.deg2rad(30.0)
        d = jnp.array([np.sin(theta_i), 0.0, np.cos(theta_i)])
        o = jnp.array([0.0, 0, 0])
        nrm = jnp.array([0.0, 0, 1.0])
        _, dd, ok = refract_ray(o, d, nrm, jnp.asarray(1.0),
                                jnp.asarray(n_ratio))
        assert bool(ok)
        sin_t = np.linalg.norm(np.cross(np.asarray(dd), [0, 0, 1.0]))
        np.testing.assert_allclose(np.sin(theta_i), n_ratio * sin_t,
                                   atol=1e-12)

    def test_refract_total_internal_reflection_keeps_ray(self):
        # Going into a less dense medium at a steep angle -> no refraction;
        # input ray returned (matching Camera::unproject's failure behavior).
        n_ratio = 0.5  # n2/n1 < 1
        theta_i = np.deg2rad(80.0)
        d = jnp.array([np.sin(theta_i), 0.0, np.cos(theta_i)])
        o = jnp.array([0.0, 0, 0])
        nrm = jnp.array([0.0, 0, 1.0])
        oo, dd, ok = refract_ray(o, d, nrm, jnp.asarray(1.0),
                                 jnp.asarray(n_ratio))
        assert not bool(ok)
        np.testing.assert_allclose(dd, d, atol=1e-12)
        np.testing.assert_allclose(oo, o, atol=1e-12)


class TestQuartic:
    def test_flat_interface_snell_consistency(self):
        # For a point at radius r, height z beyond an interface at distance d,
        # the refraction point radius ri must satisfy Snell's law:
        #   sin(a1) = n * sin(a2) with tan(a1) = ri/d,
        #   tan(a2) = (r - ri)/(z - d).
        r, z, d, n = 80.0, 500.0, 10.0, 1.333
        ri = float(refraction_radius(jnp.asarray(r), jnp.asarray(z),
                                     jnp.asarray(d), jnp.asarray(n)))
        assert 0.0 < ri < r
        a1 = np.arctan2(ri, d)
        a2 = np.arctan2(r - ri, z - d)
        np.testing.assert_allclose(np.sin(a1), n * np.sin(a2), atol=1e-9)

    def test_zero_radius(self):
        ri = float(refraction_radius(jnp.asarray(0.0), jnp.asarray(100.0),
                                     jnp.asarray(5.0), jnp.asarray(1.33)))
        np.testing.assert_allclose(ri, 0.0, atol=1e-12)

    def test_batched(self):
        r = jnp.linspace(0.1, 200.0, 64)
        ri = refraction_radius(r, jnp.full_like(r, 400.0), 8.0, 1.33)
        assert ri.shape == r.shape
        assert np.all(np.asarray(ri) >= 0)
        assert np.all(np.asarray(ri) <= np.asarray(r) + 1e-9)


def simple_K():
    return np.array([[1500.0, 0.0, 512.0],
                     [0.0, 1480.0, 384.0],
                     [0.0, 0.0, 1.0]])


class TestCamera:
    def test_project_pinhole_matches_P(self, rng):
        K = simple_K()
        # Random-ish but well-conditioned rotation
        th = 0.3
        R = np.array([[np.cos(th), 0, np.sin(th)],
                      [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        t = np.array([10.0, -5.0, 100.0])
        cam = make_camera(K, R, t)
        X = rng.normal(size=(32, 3)) * 50 + np.array([0, 0, 600.0])
        xy, valid = project(cam, jnp.asarray(X))
        P = K @ np.hstack([R, t[:, None]])
        Xh = np.hstack([X, np.ones((32, 1))])
        q = Xh @ P.T
        expected = q[:, :2] / q[:, 2:3]
        np.testing.assert_allclose(np.asarray(xy), expected, atol=1e-9)
        assert np.all(np.asarray(valid))

    def test_distort_undistort_roundtrip(self, rng):
        # Coefficients from the example project (camera 7310085).
        dist = np.array([-0.131, 1.973, 0.008, 0.007, -18.448])
        cam = make_camera(simple_K(), np.eye(3), np.zeros(3), dist=dist)
        xy = rng.uniform([400, 300], [600, 460], size=(64, 2))
        xy_d = distort(cam, jnp.asarray(xy))
        xy_u = undistort(cam, xy_d)
        np.testing.assert_allclose(np.asarray(xy_u), xy, atol=1e-3)

    def test_unproject_project_roundtrip_pinhole(self, rng):
        cam = make_camera(simple_K(), np.eye(3), np.zeros(3))
        xy = rng.uniform([100, 100], [900, 660], size=(16, 2))
        o, d = unproject(cam, jnp.asarray(xy))
        X = np.asarray(o) + 700.0 * np.asarray(d)
        xy2, _ = project(cam, jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(xy2), xy, atol=1e-8)

    def test_unproject_project_roundtrip_refractive(self, rng):
        # The critical identity: project(unproject(p) at any depth) == p for a
        # refractive camera.  Validates the quartic projection against the
        # Snell unprojection independently (they are implemented differently).
        cam = make_camera(
            simple_K(), np.eye(3), np.zeros(3),
            plane_normal=norm(np.array([0.02, -0.01, 1.0])),
            plane_dist=12.0, refr_index=1.333)
        assert bool(cam.is_refractive)
        xy = rng.uniform([200, 200], [800, 560], size=(24, 2))
        o, d = unproject(cam, jnp.asarray(xy))
        for depth in (40.0, 300.0, 900.0):
            X = np.asarray(o) + depth * np.asarray(d)
            xy2, valid = project(cam, jnp.asarray(X))
            assert np.all(np.asarray(valid))
            np.testing.assert_allclose(np.asarray(xy2), xy, atol=1e-5)

    def test_unproject_project_roundtrip_refractive_distorted(self, rng):
        cam = make_camera(
            simple_K(), np.eye(3), np.zeros(3),
            dist=np.array([-0.1, 0.5, 0.002, -0.001, -2.0]),
            plane_normal=norm(np.array([-0.01, 0.03, 1.0])),
            plane_dist=8.0, refr_index=1.4)
        xy = rng.uniform([300, 250], [700, 500], size=(16, 2))
        o, d = unproject(cam, jnp.asarray(xy))
        X = np.asarray(o) + 500.0 * np.asarray(d)
        xy2, valid = project(cam, jnp.asarray(X))
        assert np.all(np.asarray(valid))
        np.testing.assert_allclose(np.asarray(xy2), xy, atol=1e-4)

    def test_refractive_differs_from_pinhole(self, rng):
        cam_r = make_camera(simple_K(), np.eye(3), np.zeros(3),
                            plane_dist=12.0, refr_index=1.333)
        cam_p = make_camera(simple_K(), np.eye(3), np.zeros(3))
        X = jnp.asarray([[150.0, 80.0, 500.0]])
        xy_r, _ = project(cam_r, X)
        xy_p, _ = project(cam_p, X)
        # Refraction bends rays toward the axis -> projected point differs
        assert np.abs(np.asarray(xy_r) - np.asarray(xy_p)).max() > 1.0

    def test_principal_ray(self):
        cam = make_camera(simple_K(), np.eye(3), np.zeros(3))
        o, d = principal_ray(cam)
        np.testing.assert_allclose(np.asarray(o), [0, 0, 0], atol=1e-12)
        np.testing.assert_allclose(np.asarray(d), [0, 0, 1], atol=1e-12)


class TestDecomposeP:
    def test_roundtrip_synthetic(self):
        K = simple_K()
        th = 0.4
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0],
                      [0, 0, 1.0]])
        t = np.array([3.0, -2.0, 40.0])
        P = K @ np.hstack([R, t[:, None]])
        K2, R2, t2, C2 = decompose_P(P)
        np.testing.assert_allclose(K2 / K2[2, 2], K, atol=1e-6)
        np.testing.assert_allclose(R2, R, atol=1e-8)
        np.testing.assert_allclose(t2, t, atol=1e-6)
        np.testing.assert_allclose(C2, -R.T @ t, atol=1e-6)

    def test_example_project_matrices_reproject(self, rng):
        # Decompose the example project's P matrices and verify the
        # decomposed camera reprojects like P (up to fp noise).
        import xml.etree.ElementTree as ET
        import os
        path = "/root/reference/example/project.xml"
        if not os.path.exists(path):
            pytest.skip("example project not available")
        root = ET.parse(path).getroot()
        n_checked = 0
        for cam_el in root.find("cameras"):
            pm = cam_el.find("projectionMatrix")
            P = np.array([[float(pm.get(f"m{r}{c}"))
                           for c in range(1, 5)] for r in range(1, 4)])
            K, R, t, C = decompose_P(P)
            # R orthonormal
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
            cam = make_camera(K, R, t)
            X = rng.normal(size=(16, 3)) * 100 + np.array([0, 0, 500.0])
            Xh = np.hstack([X, np.ones((16, 1))])
            q = Xh @ P.T
            expected = q[:, :2] / q[:, 2:3]
            xy, _ = project(cam, jnp.asarray(X))
            np.testing.assert_allclose(np.asarray(xy), expected, rtol=2e-3,
                                       atol=0.5)
            n_checked += 1
        assert n_checked == 8
