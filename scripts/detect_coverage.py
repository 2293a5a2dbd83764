"""Measure checkerboard-detection coverage over the example project.

Writes /tmp/detect_results.json: per image-set x camera -> found / n_corners,
plus wall-clock per image. Used to drive detector-quality work (BASELINE.md
records 91/240 for the round-1 detector).
"""
import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/root/reference/example"


def _work(item):
    # imported in the worker so each process pays numpy init once
    import numpy as np
    from PIL import Image
    from stereoreconstruction_tpu.features.checkerboard import (
        find_chessboard_corners)

    set_name, cam_id, path = item
    t0 = time.time()
    img = np.asarray(Image.open(path).convert("L"), np.float64)
    corners = find_chessboard_corners(img, 11, 9)
    dt = time.time() - t0
    return set_name, cam_id, corners is not None, dt


def main(limit=None):
    from stereoreconstruction_tpu.data.project_io import load_project
    proj = load_project(os.path.join(ROOT, "project.xml"))
    items = []
    for s in proj.image_sets.values():
        if s.name == "bunny":
            continue
        for img in s.images:
            path = img.file if os.path.isabs(img.file) else \
                os.path.join(s.root, img.file)
            items.append((s.name, img.camera_id, path))
    if limit:
        items = items[:limit]
    results = []
    t0 = time.time()
    with ProcessPoolExecutor(max_workers=2) as ex:
        for i, r in enumerate(ex.map(_work, items)):
            results.append(r)
            print(f"[{i+1}/{len(items)}] {r[0]}/{r[1]} found={r[2]} "
                  f"{r[3]:.1f}s", flush=True)
    found = sum(1 for r in results if r[2])
    print(f"coverage: {found}/{len(results)} in {time.time()-t0:.0f}s")
    with open("/tmp/detect_results.json", "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main(limit=int(sys.argv[1]) if len(sys.argv) > 1 else None)
