"""Gap filling, weighted median, epipolar curves, PMVS export, capture."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from stereoreconstruction_tpu.stereo.postprocess import (
    fill_gaps, weighted_median_fill)
from stereoreconstruction_tpu.stereo.epipolar import (
    epipolar_curve, rasterize_curve)
from stereoreconstruction_tpu.geometry import make_camera, project
from stereoreconstruction_tpu.data.pmvs import export_pmvs


class TestFillGaps:
    def test_narrow_gap_filled(self):
        d = np.full((1, 10), 5.0)
        d[0, 4] = np.inf
        out = fill_gaps(d, gap_width_threshold=2)
        assert out[0, 4] == 5.0

    def test_wide_gap_kept(self):
        d = np.full((1, 10), 5.0)
        d[0, 3:7] = np.inf
        out = fill_gaps(d, gap_width_threshold=2)
        assert np.isinf(out[0, 3:7]).all()

    def test_fills_from_both_sides(self):
        d = np.array([[1.0, np.inf, 9.0]])
        out = fill_gaps(d, gap_width_threshold=2)
        # single-pixel gap: left value written first, right overwrites via
        # symmetric fill when a == b (start==end writes ld then rd)
        assert np.isfinite(out[0, 1])


class TestWeightedMedian:
    def test_fills_invalid_with_window_median(self):
        d = np.full((7, 7), 10.0)
        d[3, 3] = np.inf
        w = np.ones((5, 5, 7, 7))
        out = np.asarray(weighted_median_fill(jnp.asarray(d),
                                              jnp.asarray(w), 0.0, 100.0))
        assert out[3, 3] == 10.0
        assert (out[0, 0] == 10.0)

    def test_respects_depth_bounds(self):
        d = np.full((7, 7), 500.0)
        d[3, 3] = np.nan
        w = np.ones((5, 5, 7, 7))
        out = np.asarray(weighted_median_fill(jnp.asarray(d),
                                              jnp.asarray(w), 0.0, 100.0))
        assert np.isnan(out[3, 3])     # neighbors out of depth range

    def test_weighted_choice(self):
        d = np.full((7, 7), 1.0)
        d[3, 2:5] = 9.0
        d[3, 3] = np.nan
        w = np.zeros((5, 5, 7, 7))
        # give all the weight to the 9-valued neighbors
        w[2, 1] = w[2, 3] = 1.0
        out = np.asarray(weighted_median_fill(jnp.asarray(d),
                                              jnp.asarray(w), 0.0, 100.0))
        assert out[3, 3] == 9.0


class TestEpipolar:
    def test_curve_matches_projection(self):
        K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
        cam1 = make_camera(K, np.eye(3), np.zeros(3))
        th = 0.1
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        cam2 = make_camera(K, R, np.array([-10.0, 0, 1.0]))
        curve = epipolar_curve(cam1, cam2, (70.0, 50.0), 50.0, 150.0,
                               num_samples=20)
        assert curve.valid.sum() > 10
        # each curve point reprojects from the actual 3D sample
        pix = rasterize_curve(curve, 128, 96)
        assert len(pix) > 5
        assert (pix[:, 0] >= 0).all() and (pix[:, 0] < 128).all()

    def test_refractive_curve_is_curved(self):
        K = np.array([[300.0, 0, 64], [0, 300.0, 48], [0, 0, 1]])
        kw = dict(plane_normal=np.array([0.05, 0.02, 1.0]),
                  plane_dist=2.0, refr_index=1.333)
        cam1 = make_camera(K, np.eye(3), np.zeros(3), **kw)
        th = 0.15
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        cam2 = make_camera(K, R, np.array([-12.0, 1.0, 2.0]), **kw)
        c = epipolar_curve(cam1, cam2, (80.0, 55.0), 20.0, 120.0,
                           num_samples=40)
        xy = c.xy[c.valid]
        assert len(xy) > 10
        # fit a line; refractive curves deviate from straightness
        t = np.polyfit(xy[:, 0], xy[:, 1], 1)
        resid = np.abs(np.polyval(t, xy[:, 0]) - xy[:, 1]).max()
        assert resid > 1e-3


class TestPMVS:
    def test_export_layout(self, tmp_path, rng):
        from PIL import Image
        img1 = tmp_path / "a.jpg"
        Image.fromarray(
            rng.integers(0, 255, (8, 10, 3)).astype(np.uint8)).save(img1)
        P = np.hstack([np.eye(3), np.zeros((3, 1))])
        argv = export_pmvs(str(tmp_path / "pmvs"), [P, P],
                           [str(img1), str(img1)])
        assert argv[0] == "pmvs-2"
        txt = (tmp_path / "pmvs" / "txt" / "00000000.txt").read_text()
        assert txt.startswith("CONTOUR")
        assert (tmp_path / "pmvs" / "visualize" / "00000001.jpg").exists()
        opts = (tmp_path / "pmvs" / "option.txt").read_text()
        assert "timages -1 0 2" in opts


class TestOctaveDump:
    def test_octave_matrix_roundtrip(self, tmp_path):
        """write_octave_matrix emits the reference's header
        (calibrate.cpp:274-280) in a form Octave/NumPy can read back."""
        import io
        import numpy as np
        from stereoreconstruction_tpu.data.formats import (
            write_octave_matrix)
        m = np.array([[1.5, -2.0, 3.25], [0.0, 4.0, 5.5]])
        buf = io.StringIO()
        write_octave_matrix(buf, "P", m)
        text = buf.getvalue()
        assert "# name: P" in text and "# type: matrix" in text
        assert "# rows: 2" in text and "# columns: 3" in text
        body = [l for l in text.splitlines() if not l.startswith("#")]
        back = np.array([[float(v) for v in l.split()] for l in body])
        np.testing.assert_array_equal(back, m)
