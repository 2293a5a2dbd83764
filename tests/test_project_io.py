"""Project XML I/O: example-project load + golden round-trip."""

import os

import numpy as np
import pytest

from stereoreconstruction_tpu.data.project_io import (
    load_project, save_project, FeatureRecord, ProjectData, CameraRecord,
    ImageSetRecord, ImageRecord)

from conftest import EXAMPLE_PROJECT, example_project_available


needs_example = pytest.mark.skipif(not example_project_available(),
                                   reason="example project not mounted")


@needs_example
class TestExampleProject:
    def test_load(self):
        proj = load_project(EXAMPLE_PROJECT)
        assert len(proj.cameras) == 8
        assert len(proj.image_sets) == 31          # 30 checkerboard + bunny
        assert "bunny" in proj.image_sets
        bunny = proj.image_sets["bunny"]
        assert len(bunny.images) == 8
        img = bunny.default_image_for_camera("7310085")
        assert img is not None and os.path.exists(img.file)
        cam = proj.cameras["7310085"]
        assert cam.P.shape == (3, 4)
        # k-ordering: [k1 k2 p1 p2 k3] from the k1/k2/p1/p2/k3 attributes
        np.testing.assert_allclose(cam.dist,
                                   [-0.131, 1.973, 0.008, 0.007, -18.448])

    def test_round_trip(self, tmp_path):
        proj = load_project(EXAMPLE_PROJECT)
        out = str(tmp_path / "roundtrip.xml")
        save_project(proj, out)
        proj2 = load_project(out)

        assert set(proj2.cameras) == set(proj.cameras)
        assert set(proj2.image_sets) == set(proj.image_sets)
        for cid in proj.cameras:
            np.testing.assert_allclose(proj2.cameras[cid].P,
                                       proj.cameras[cid].P, rtol=1e-12)
            np.testing.assert_allclose(proj2.cameras[cid].dist,
                                       proj.cameras[cid].dist, rtol=1e-12)
        for sid in proj.image_sets:
            a = proj.image_sets[sid]
            b = proj2.image_sets[sid]
            assert [i.camera_id for i in a.images] == \
                [i.camera_id for i in b.images]
            assert [os.path.abspath(i.file) for i in a.images] == \
                [os.path.abspath(i.file) for i in b.images]


class TestFeatureRoundTrip:
    def test_features_and_correspondences(self, tmp_path):
        proj = ProjectData(path=str(tmp_path / "p.xml"))
        proj.cameras["c1"] = CameraRecord(
            id="c1", name="c1", P=np.hstack([np.eye(3), np.zeros((3, 1))]),
            dist=np.zeros(5))
        proj.cameras["c2"] = CameraRecord(
            id="c2", name="c2", P=np.hstack([np.eye(3), np.ones((3, 1))]),
            dist=np.array([0.1, 0, 0, 0, 0]))
        iset = ImageSetRecord(id="s1", name="s1", root=str(tmp_path))
        iset.images.append(ImageRecord(file=str(tmp_path / "a.jpg"),
                                       camera_id="c1", exposure=31.25))
        iset.images.append(ImageRecord(file=str(tmp_path / "b.jpg"),
                                       camera_id="c2"))
        proj.image_sets["s1"] = iset
        proj.features[("s1", "c1")] = [
            FeatureRecord(x=1.5, y=2.5, kind="checkerboard", corner_index=0,
                          image_set_id="s1"),
            FeatureRecord(x=3.5, y=4.5, kind="checkerboard", corner_index=1,
                          image_set_id="s1"),
        ]
        proj.features[("s1", "c2")] = [
            FeatureRecord(x=9.0, y=8.0, kind="surf",
                          descriptor=np.arange(4) / 7.0),
        ]
        proj.correspondences[("s1", "c1", "s1", "c2")] = [(0, 0), (1, 0)]

        out = str(tmp_path / "p.xml")
        save_project(proj, out)
        p2 = load_project(out)

        f1 = p2.features[("s1", "c1")]
        assert [f.corner_index for f in f1] == [0, 1]
        assert f1[0].x == 1.5 and f1[1].y == 4.5
        f2 = p2.features[("s1", "c2")]
        assert f2[0].kind == "surf"
        np.testing.assert_allclose(f2[0].descriptor, np.arange(4) / 7.0)
        pairs, swapped = p2.correspondences_for("s1", "c1", "s1", "c2")
        assert pairs == [(0, 0), (1, 0)] and not swapped
        pairs_r, swapped_r = p2.correspondences_for("s1", "c2", "s1", "c1")
        assert pairs_r == [(0, 0), (1, 0)] and swapped_r
        assert p2.image_sets["s1"].images[0].exposure == 31.25


class TestResponseInterfaceOrder:
    def test_roundtrip_with_response_and_interface(self, tmp_path):
        """A camera with BOTH a response curve and a refractive interface
        must survive save->load with validation on (ADVICE r2: the writer
        used to emit <response> before <refractiveInterface>, which the
        ordered validator rejected)."""
        proj = ProjectData(path=str(tmp_path / "p.xml"))
        rec = CameraRecord(
            id="c1", name="c1",
            P=np.hstack([np.eye(3), np.zeros((3, 1))]), dist=np.zeros(5))
        rec.response = np.linspace(0.0, 2.0, 256)[:, None].repeat(3, 1)
        rec.refr_px, rec.refr_py = 320.0, 240.0
        rec.refr_dist, rec.refr_index = 10.0, 1.333
        proj.cameras["c1"] = rec
        out = str(tmp_path / "p.xml")
        save_project(proj, out)
        p2 = load_project(out)     # validation on by default
        c = p2.cameras["c1"]
        assert abs(c.refr_index - 1.333) < 1e-12
        np.testing.assert_allclose(c.response, rec.response, rtol=1e-12)

    def test_reference_writer_order_accepted(self, tmp_path):
        """The reference's own writer emits response BEFORE
        refractiveInterface (project.cpp:385-413); the validator must
        accept that order too."""
        xml = ("<project><cameras><camera id='c'>"
               "<projectionMatrix "
               + " ".join(f"m{r}{c}='1'" for r in range(1, 4)
                          for c in range(1, 5))
               + "/><response channel='red'>"
               + "<value>1</value>" * 256 + "</response>"
               "<refractiveInterface px='1' py='1' dist='5' "
               "refractiveRatio='1.3'/>"
               "</camera></cameras></project>")
        f = tmp_path / "ref_order.xml"
        f.write_text(xml)
        p = load_project(str(f))
        assert abs(p.cameras["c"].refr_index - 1.3) < 1e-12
