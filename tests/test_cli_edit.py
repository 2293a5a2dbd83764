"""CLI `edit` verb: headless project CRUD + camera parameter editing
(gui/mainwindow.cpp:1221-1408 tree actions; stereowidget.cpp:472-549
refractive spinners) with validated round-trips."""

import numpy as np

from stereoreconstruction_tpu.cli import main
from stereoreconstruction_tpu.data.project_io import (
    load_project, save_project, ProjectData, CameraRecord, ImageSetRecord,
    ImageRecord, FeatureRecord)


def make_project(tmp_path):
    proj = ProjectData()
    P = np.zeros((3, 4))
    P[:, :3] = np.eye(3)
    for cid in ("a", "b"):
        proj.cameras[cid] = CameraRecord(id=cid, name=cid, P=P.copy(),
                                         dist=np.zeros(5))
    iset = ImageSetRecord(id="s1", name="s1", root=str(tmp_path))
    iset.images.append(ImageRecord(file=str(tmp_path / "x.jpg"),
                                   camera_id="a"))
    proj.image_sets["s1"] = iset
    proj.features[("s1", "a")] = [FeatureRecord(x=1, y=2, kind="surf")]
    proj.features[("s1", "b")] = [FeatureRecord(x=3, y=4, kind="surf")]
    proj.correspondences[("s1", "a", "s1", "b")] = [(0, 0)]
    path = tmp_path / "p.xml"
    save_project(proj, str(path))
    return str(path)


def test_set_and_clear_interface(tmp_path):
    path = make_project(tmp_path)
    out = str(tmp_path / "o.xml")
    rc = main(["edit", path, "-o", out,
               "--set-interface", "a", "320", "240", "2.5", "1.333"])
    assert rc == 0
    p2 = load_project(out)
    rec = p2.cameras["a"]
    assert (rec.refr_px, rec.refr_py) == (320, 240)
    assert rec.refr_dist == 2.5 and rec.refr_index == 1.333
    # to_camera picks up the interface
    cam = rec.to_camera()
    assert float(cam.refr_index) == 1.333

    rc = main(["edit", out, "--clear-interface", "a"])
    assert rc == 0
    p3 = load_project(out)
    assert p3.cameras["a"].refr_index == 1.0


def test_remove_camera_drops_dependents(tmp_path):
    path = make_project(tmp_path)
    rc = main(["edit", path, "--remove-camera", "b"])
    assert rc == 0
    p2 = load_project(path)
    assert set(p2.cameras) == {"a"}
    assert ("s1", "b") not in p2.features
    assert not p2.correspondences


def test_remove_set_drops_dependents(tmp_path):
    path = make_project(tmp_path)
    rc = main(["edit", path, "--remove-set", "s1"])
    assert rc == 0
    p2 = load_project(path)
    assert not p2.image_sets and not p2.features
    assert not p2.correspondences


def test_add_and_edit_params(tmp_path):
    path = make_project(tmp_path)
    (tmp_path / "new.jpg").write_bytes(b"")
    rc = main(["edit", path,
               "--add-camera", "c",
               "--add-set", "s2",
               "--add-image", "s2", "c", str(tmp_path / "new.jpg"),
               "--set-distortion", "c", "0.1,0.2,0,0,0.3",
               "--set-p", "c", "900,0,320,0,0,900,240,0,0,0,1,0",
               "--rename-camera", "c", "left rig cam"])
    assert rc == 0
    p2 = load_project(path)
    rec = p2.cameras["c"]
    assert rec.name == "left rig cam"
    np.testing.assert_allclose(rec.dist, [0.1, 0.2, 0, 0, 0.3])
    assert rec.P[0, 0] == 900 and rec.P[2, 2] == 1
    img = p2.image_sets["s2"].default_image_for_camera("c")
    assert img is not None and img.file.endswith("new.jpg")


def test_unknown_camera_fails(tmp_path):
    path = make_project(tmp_path)
    try:
        rc = main(["edit", path, "--clear-interface", "zz"])
    except SystemExit as e:
        rc = e.code
    assert rc == 1
