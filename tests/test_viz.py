"""Viz layer: surface-splat renderer (PointsViewScene USE_SPLATS path,
gui/widgets/pointsviewscene.cpp + shaders/splats_pass{1,2,3}) and the
cloud / convert-raw CLI workflows (gui/mainwindow.cpp:1054-1104)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereoreconstruction_tpu.viz.splats import splat_image


def _grid_cloud(z, color, n=40, extent=1.0):
    """A flat square of points at depth-axis offset z, facing the camera."""
    xs = np.linspace(-extent, extent, n)
    X, Y = np.meshgrid(xs, xs)
    pts = np.stack([X.ravel(), Y.ravel(), np.full(n * n, float(z))], -1)
    cols = np.tile(np.asarray(color, float), (n * n, 1))
    normals = np.tile([0.0, 0.0, 1.0], (n * n, 1))
    return pts, cols, normals


class TestSplats:
    def test_uniform_color_normalizes(self):
        # pass 3 (color/alpha) must reproduce the input color exactly for a
        # single-color cloud regardless of overlapping splat weights
        pts, cols, nrm = _grid_cloud(0.0, (10, 200, 30))
        img = splat_image(pts, cols, normals=nrm, width=128, height=128,
                          elev=90.0, azim=0.0)
        lit = img.sum(-1) > 0
        assert lit.mean() > 0.05
        center = img[60:68, 60:68].reshape(-1, 3)
        assert np.all(np.abs(center.astype(int) - [10, 200, 30]) <= 1)

    def test_visibility_pass_occludes(self):
        # pass 1 epsilon depth test: the near plane must hide the far plane
        near, cn, nn_ = _grid_cloud(0.5, (255, 0, 0))
        far, cf, nf = _grid_cloud(-0.5, (0, 0, 255))
        pts = np.concatenate([near, far])
        cols = np.concatenate([cn, cf])
        nrm = np.concatenate([nn_, nf])
        # camera looks along -z from above (elev=90 looks down +z axis)
        img = splat_image(pts, cols, normals=nrm, width=96, height=96,
                          elev=90.0, azim=0.0, epsilon_frac=0.05)
        center = img[40:56, 40:56].reshape(-1, 3).astype(int)
        # the plane nearer the camera wins everywhere in the overlap
        dominant_red = (center[:, 0] > 200) & (center[:, 2] < 50)
        dominant_blue = (center[:, 2] > 200) & (center[:, 0] < 50)
        assert dominant_red.all() or dominant_blue.all()

    def test_backface_discard(self):
        # splats_pass2.fs: dot(normal, viewDir) < 1e-3 -> discard.  A cloud
        # whose normals face away still renders (we flip like double-sided
        # lighting), but degenerate in-plane normals are culled.
        pts, cols, _ = _grid_cloud(0.0, (255, 255, 255), n=16)
        sideways = np.tile([1.0, 0.0, 0.0], (len(pts), 1))
        img = splat_image(pts, cols, normals=sideways, width=64, height=64,
                          elev=90.0, azim=0.0)
        assert img.sum() == 0

    def test_background_only_when_empty(self):
        img = splat_image(np.zeros((0, 3)), None, width=32, height=32,
                          background=7)
        assert img.shape == (32, 32, 3) and np.all(img == 7)


class TestCloudCLI:
    def test_cloud_splats(self, tmp_path):
        from stereoreconstruction_tpu.cli import main
        from stereoreconstruction_tpu.data.ply import write_ply
        pts, cols, _ = _grid_cloud(0.0, (90, 120, 200), n=24)
        ply = str(tmp_path / "cloud.ply")
        write_ply(ply, pts, cols)
        out = str(tmp_path / "cloud.png")
        main(["cloud", ply, "-o", out, "--splats", "--size", "96",
              "--elev", "90", "--azim", "0"])
        from PIL import Image
        img = np.asarray(Image.open(out))
        assert img.shape == (96, 96, 3) and img.sum() > 0


class TestConvertRawCLI:
    def test_convert_raw_tree(self, tmp_path):
        from stereoreconstruction_tpu.cli import main
        from stereoreconstruction_tpu.data.demosaic import demosaic_es
        rng = np.random.default_rng(3)
        raw = rng.integers(0, 256, (24, 32), dtype=np.uint8)
        sub = tmp_path / "a" / "b"
        sub.mkdir(parents=True)
        raw.tofile(str(sub / "img0.raw"))
        # wrong-sized file must be skipped (reference deletes it; we keep)
        (tmp_path / "bad.raw").write_bytes(b"\0" * 10)
        main(["convert-raw", str(tmp_path), "--width", "32",
              "--height", "24"])
        from PIL import Image
        out = np.asarray(Image.open(str(sub / "img0.png")))
        assert np.array_equal(out, demosaic_es(raw))
        assert (sub / "img0.raw").exists()        # no --delete
        assert not (tmp_path / "bad.png").exists()

    def test_convert_raw_delete(self, tmp_path):
        from stereoreconstruction_tpu.cli import main
        raw = np.zeros((8, 8), np.uint8)
        raw.tofile(str(tmp_path / "x.raw"))
        main(["convert-raw", str(tmp_path), "--width", "8", "--height", "8",
              "--delete"])
        assert not (tmp_path / "x.raw").exists()
        assert (tmp_path / "x.png").exists()


class TestPMVSCLI:
    def test_pmvs_export(self, tmp_path):
        from stereoreconstruction_tpu.cli import main
        pytest.importorskip("PIL")
        # build a 2-camera project XML around tiny images
        from PIL import Image
        imdir = tmp_path / "images"
        imdir.mkdir()
        for name in ("l.png", "r.png"):
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
                str(imdir / name))
        P = ('m11="100" m12="0" m13="4" m14="0" m21="0" m22="100" m23="4" '
             'm24="0" m31="0" m32="0" m33="1" m34="0"')
        xml = f"""<?xml version="1.0"?>
<project>
 <cameras>
  <camera id="c1"><projectionMatrix {P}/></camera>
  <camera id="c2"><projectionMatrix {P}/></camera>
 </cameras>
 <imageSets>
  <imageSet id="s1" root="{imdir}">
   <image for="c1" default="yes" file="l.png"/>
   <image for="c2" default="yes" file="r.png"/>
  </imageSet>
 </imageSets>
</project>"""
        proj_path = tmp_path / "p.xml"
        proj_path.write_text(xml)
        out = tmp_path / "pmvs"
        main(["pmvs", str(proj_path), "--image-set", "s1", "-o", str(out)])
        assert (out / "txt" / "00000000.txt").read_text().startswith(
            "CONTOUR")
        assert (out / "visualize" / "00000001.png").exists()
        assert "level 1" in (out / "option.txt").read_text()
