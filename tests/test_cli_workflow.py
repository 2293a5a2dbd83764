"""End-to-end CLI workflow on a synthetic rig: render checkerboard images,
then detect -> match -> calibrate through the CLI and verify the recovered
intrinsics."""

import os

import numpy as np
import pytest
from PIL import Image

from stereoreconstruction_tpu.calib.zhang import rodrigues
from stereoreconstruction_tpu.calib.rig import board_object_points
from stereoreconstruction_tpu.config import CalibrationConfig
from stereoreconstruction_tpu.data.project_io import (
    ProjectData, CameraRecord, ImageSetRecord, ImageRecord, save_project,
    load_project)

W, H = 420, 320
COLS, ROWS = 8, 6            # inner corners
CELL = 11.0


def render_board(K, R, t, w=W, h=H):
    """Inverse-warp render of a checkerboard plane (z=0)."""
    Hmat = K @ np.column_stack([R[:, 0], R[:, 1], t])
    Hinv = np.linalg.inv(Hmat)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    pts = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], -1)
    uv = pts @ Hinv.T
    u = uv[..., 0] / uv[..., 2]
    v = uv[..., 1] / uv[..., 2]
    behind = uv[..., 2] <= 0
    # board spans squares [-CELL, COLS*CELL+CELL] x likewise (outer border)
    iu = np.floor(u / CELL).astype(int)
    iv = np.floor(v / CELL).astype(int)
    inside = ((u >= -CELL) & (u <= (COLS + 1) * CELL)
              & (v >= -CELL) & (v <= (ROWS + 1) * CELL) & ~behind)
    check = ((iu + iv) % 2 == 0)
    img = np.where(inside & check, 30, np.where(inside, 225, 128))
    return np.stack([img] * 3, -1).astype(np.uint8)


@pytest.fixture(scope="module")
def synthetic_project(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("proj")
    rng = np.random.default_rng(3)
    n_cams, n_sets = 2, 14
    Ks = [np.array([[420.0 + 15 * i, 0, W / 2 + 3 * i],
                    [0, 415.0 + 10 * i, H / 2 - 2 * i],
                    [0, 0, 1.0]]) for i in range(n_cams)]
    cam_R, cam_t = [], []
    for i in range(n_cams):
        ang = (i - 0.5) * 0.25
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        C = np.array([-np.sin(ang) * 420.0, 0.0,
                      -(420.0 - np.cos(ang) * 420.0)])
        cam_R.append(R)
        cam_t.append(R @ -C)

    proj = ProjectData(path=str(tmp / "p.xml"))
    for i in range(n_cams):
        P = Ks[i] @ np.hstack([np.eye(3), np.zeros((3, 1))])
        proj.cameras[f"cam{i}"] = CameraRecord(
            id=f"cam{i}", name=f"cam{i}", P=P, dist=np.zeros(5))

    obj = board_object_points(CalibrationConfig(
        board_cols=COLS, board_rows=ROWS, cell_size=CELL))
    for s in range(n_sets):
        iset = ImageSetRecord(id=f"{s:03d}", name=f"{s:03d}", root=str(tmp))
        w = rng.normal(0, 0.3, 3)
        Rb = np.asarray(rodrigues(w))
        tb = np.array([rng.uniform(-60, 10), rng.uniform(-40, 10),
                       rng.uniform(330, 480)])
        visible_all = True
        frames = []
        for i in range(n_cams):
            R = cam_R[i] @ Rb
            t = cam_R[i] @ tb + cam_t[i]
            corners = (obj @ R.T + t) @ Ks[i].T
            corners = corners[:, :2] / corners[:, 2:]
            if not np.all((corners > 8) & (corners < [W - 8, H - 8])):
                visible_all = False
                break
            frames.append(render_board(Ks[i], R, t))
        if not visible_all:
            continue
        for i, frame in enumerate(frames):
            fn = tmp / f"s{s}_c{i}.png"
            Image.fromarray(frame).save(fn)
            iset.images.append(ImageRecord(file=str(fn),
                                           camera_id=f"cam{i}"))
        proj.image_sets[iset.id] = iset

    save_project(proj, str(tmp / "p.xml"))
    return tmp, Ks


def test_cli_detect_match_calibrate(synthetic_project):
    from stereoreconstruction_tpu import cli

    tmp, Ks = synthetic_project
    proj_path = str(tmp / "p.xml")
    n_sets = len(load_project(proj_path).image_sets)
    assert n_sets >= 4, f"only {n_sets} fully-visible sets rendered"

    assert cli.main(["detect", proj_path, "-o", proj_path,
                     "--rows", str(ROWS + 1), "--cols", str(COLS + 1)]) == 0
    p = load_project(proj_path)
    assert len(p.features) >= 8   # most boards detected

    assert cli.main(["match", proj_path]) == 0
    p = load_project(proj_path)
    assert len(p.correspondences) >= 3

    assert cli.main(["calibrate", proj_path,
                     "--rows", str(ROWS + 1), "--cols", str(COLS + 1),
                     "--cell-size", str(CELL)]) == 0
    p = load_project(proj_path)
    for i in range(2):
        K, R, t, C = p.cameras[f"cam{i}"].decompose()
        assert abs(K[0, 0] - Ks[i][0, 0]) / Ks[i][0, 0] < 0.05, \
            f"cam{i} focal {K[0, 0]} vs {Ks[i][0, 0]}"
