"""CLI-level distributed routing (VERDICT r2 item 5): `cli stereo` joins
the cluster (initialize_distributed) and routes to the row-sharded /
depth-sharded engines when >1 device is visible; outputs must be
bit-equal to the single-device path.  Runs on the 8-device virtual CPU
mesh (conftest)."""

import numpy as np
import jax
import pytest
from PIL import Image

from stereoreconstruction_tpu.data.project_io import (
    ProjectData, CameraRecord, ImageSetRecord, ImageRecord, save_project)

from synth import converging_rig, render_scene


@pytest.fixture(scope="module")
def stereo_project(tmp_path_factory):
    """Two-camera project with a photoconsistent rendered scene."""
    tmp = tmp_path_factory.mktemp("cliproj")
    cams = converging_rig(3, refractive=False)
    rgbs, masks, _ = render_scene(cams, 48, 64, plane_dist=60.0,
                                  enable_refraction=False)
    proj = ProjectData(path=str(tmp / "p.xml"))
    iset = ImageSetRecord(id="scene", name="scene", root=str(tmp))
    for i, cam in enumerate(cams):
        cid = f"cam{i}"
        P = np.asarray(cam.K, np.float64) @ np.hstack(
            [np.asarray(cam.R, np.float64),
             np.asarray(cam.t, np.float64)[:, None]])
        proj.cameras[cid] = CameraRecord(
            id=cid, name=cid, P=P, dist=np.zeros(5))
        rgba = np.concatenate(
            [rgbs[i].astype(np.uint8),
             np.where(masks[i], 255, 0).astype(np.uint8)[..., None]],
            axis=-1)
        fn = tmp / f"v{i}.png"
        Image.fromarray(rgba, "RGBA").save(fn)
        iset.images.append(ImageRecord(file=str(fn), camera_id=cid))
    proj.image_sets["scene"] = iset
    save_project(proj, str(tmp / "p.xml"))
    return tmp


def _run(tmp, name, extra):
    from stereoreconstruction_tpu import cli
    out = tmp / name
    npz = str(tmp / f"{name}.npz")
    rc = cli.main(["stereo", str(tmp / "p.xml"), "--image-set", "scene",
                   "--min-depth", "45", "--max-depth", "80",
                   "--depth-levels", "12", "--scale", "1.0",
                   "-o", str(out), "--save-npz", npz] + extra)
    assert rc == 0
    return np.load(npz)["depths"]


def same_maps(got, want, what):
    got, want = np.asarray(got), np.asarray(want)
    same = ((np.isnan(got) & np.isnan(want))
            | (np.isinf(got) & np.isinf(want))
            | (np.isfinite(got) & np.isfinite(want)
               & np.isclose(got, np.where(np.isfinite(want), want, 0.0),
                            atol=1e-5)))
    assert same.mean() == 1.0, f"{what}: {1 - same.mean():.4f} differ"


def test_cli_twoview_rowsharded_matches(stereo_project):
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual devices")
    tmp = stereo_project
    base = _run(tmp, "tv_none",
                ["--two-view", "--cameras", "cam0", "cam1",
                 "--shard", "none", "--method", "fast"])
    shard = _run(tmp, "tv_row",
                 ["--two-view", "--cameras", "cam0", "cam1",
                  "--shard", "row", "--method", "fast"])
    assert base.shape == shard.shape
    same_maps(shard, base, "two-view row-sharded")


def test_cli_mvs_depthsharded_matches(stereo_project):
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    tmp = stereo_project
    base = _run(tmp, "mvs_none", ["--shard", "none"])
    shard = _run(tmp, "mvs_depth", ["--shard", "depth"])
    assert base.shape == shard.shape
    same_maps(shard, base, "mvs depth-sharded")
