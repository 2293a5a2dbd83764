"""Generate the calibration-accuracy audit (VERDICT r1 item 6).

1. Detects checkerboard corners on every non-bunny example image and
   commits them as tests/golden/example_corners.npz (the fixture
   tests/test_calibration_accuracy.py calibrates from — detection itself
   is validated separately).
2. Computes the side-by-side mean pairwise triangulated reprojection error
   (the reference's own metric, calibrate.cpp:284-329) of
   (a) the SHIPPED calibration and (b) OUR full from-scratch calibration,
   on the SAME detected corners.
3. Writes docs/calibration_audit.json: per-image detection audit +
   both error distributions.

Run from the repo root (CPU): python scripts/make_calibration_audit.py
"""

import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
ROOT = "/root/reference/example"


def _work(item):
    import numpy as np
    from PIL import Image
    from stereoreconstruction_tpu.features.checkerboard import (
        find_chessboard_corners)

    set_name, cam_id, path = item
    t0 = time.time()
    img = np.asarray(Image.open(path).convert("L"), np.float64)
    corners = find_chessboard_corners(img, 11, 9)
    return (set_name, cam_id,
            None if corners is None else corners.astype(np.float32),
            time.time() - t0, (img.shape[1], img.shape[0]))


def main():
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from stereoreconstruction_tpu.data.project_io import load_project
    from stereoreconstruction_tpu.config import CalibrationConfig
    from stereoreconstruction_tpu.calib.rig import (
        CameraCalibration, RigCalibrationState)

    proj = load_project(os.path.join(ROOT, "project.xml"))
    items = []
    for s in sorted(proj.image_sets.values(), key=lambda s: s.id):
        if s.name == "bunny":
            continue
        for img in s.images:
            items.append((s.id, img.camera_id, img.file))

    print(f"detecting {len(items)} boards...", flush=True)
    corners = {}
    sizes = {}
    audit = []
    t0 = time.time()
    with ProcessPoolExecutor(max_workers=4) as ex:
        for i, (sid, cid, c, dt, size) in enumerate(ex.map(_work, items)):
            if c is not None:
                corners[f"{sid}|{cid}"] = c
            sizes[cid] = size
            audit.append({"set": sid, "camera": cid,
                          "detected": c is not None,
                          "seconds": round(dt, 2)})
            print(f"[{i + 1}/{len(items)}] {sid}/{cid} "
                  f"found={c is not None} {dt:.1f}s", flush=True)
    found = sum(a["detected"] for a in audit)
    print(f"coverage: {found}/{len(audit)} in {time.time() - t0:.0f}s",
          flush=True)

    out_npz = os.path.join(REPO, "tests", "golden", "example_corners.npz")
    np.savez_compressed(out_npz, **corners,
                        __sizes__=np.array(
                            [[c] + list(sizes[c]) for c in sorted(sizes)],
                            dtype=object))
    print(f"wrote {out_npz}", flush=True)

    # ---- side-by-side error on the same corners ----
    cfg = CalibrationConfig()
    cam_ids = sorted(proj.cameras)
    set_ids = sorted({a["set"] for a in audit})
    pts = [[corners.get(f"{s}|{c}") for s in set_ids] for c in cam_ids]
    image_sizes = [sizes[c] for c in cam_ids]
    calib = CameraCalibration(pts, image_sizes, cfg)

    shipped = RigCalibrationState.identity(len(cam_ids))
    for i, cid in enumerate(cam_ids):
        K, R, t, _ = proj.cameras[cid].decompose()
        shipped.K[i], shipped.R[i], shipped.t[i] = K, R, t
        shipped.dist[i] = proj.cameras[cid].dist
    shipped_boards = calib.board_errors(shipped)
    shipped_vals = np.array(list(shipped_boards.values()))
    print(f"shipped calibration on our corners: mean "
          f"{shipped_vals.mean():.3f} px, median "
          f"{np.median(shipped_vals):.3f} px over {len(shipped_vals)} "
          "board pairs", flush=True)

    t0 = time.time()
    res = calib.calibrate()
    own_secs = time.time() - t0
    own_boards = calib.board_errors(res.state)
    own_vals = np.array(list(own_boards.values()))
    print(f"own calibration: inlier mean {res.error:.3f} px "
          f"(all-board mean {own_vals.mean():.3f}, median "
          f"{np.median(own_vals):.3f}) in {own_secs:.0f}s", flush=True)

    with open(os.path.join(REPO, "docs", "calibration_audit.json"),
              "w") as f:
        json.dump({
            "what": "per-image checkerboard detection audit + "
                    "shipped-vs-own calibration reprojection error on the "
                    "same detected corners (metric: "
                    "calibrate.cpp:284-329)",
            "detected": found,
            "total_images": len(audit),
            "images": audit,
            "shipped_mean_px": float(shipped_vals.mean()),
            "shipped_median_px": float(np.median(shipped_vals)),
            "own_inlier_mean_px": float(res.error),
            "own_all_mean_px": float(own_vals.mean()),
            "own_median_px": float(np.median(own_vals)),
            "own_pruned_observations": len(res.outlier_observations),
            "own_calibrate_seconds": round(own_secs, 1),
        }, f, indent=1)
    print("wrote docs/calibration_audit.json", flush=True)


if __name__ == "__main__":
    main()
