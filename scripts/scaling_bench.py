"""Multi-device scaling of the sharded two-view batch.

Real multi-chip hardware is unavailable in this container (one v5e behind
the axon tunnel), so scaling efficiency is demonstrated functionally on the
virtual CPU mesh: the same batch of view pairs solved on a 1-device vs an
N-device (view x row) mesh.  On CPU the devices share physical cores, so
the wall-clock ratio measures overhead/parallel structure rather than true
speedup; on a real pod slice the same code runs with ICI collectives.

Usage:  PYTHONPATH= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stereoreconstruction_tpu.config import TwoViewConfig, WeightConfig
from stereoreconstruction_tpu.parallel.sharding import (
    make_mesh, stack_cameras, twoview_batch_sharded)
from stereoreconstruction_tpu.geometry import make_camera


def scene(rng, h, w):
    K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]])
    th = 0.05
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    cam_l = make_camera(K, np.eye(3), np.zeros(3)).astype(jnp.float32)
    cam_r = make_camera(K, R, np.array([-8.0, 0.5, 1.0])).astype(jnp.float32)
    return (rng.uniform(0, 255, (h, w, 3)).astype(np.float32),
            np.ones((h, w), bool),
            rng.uniform(0, 255, (h, w, 3)).astype(np.float32),
            np.ones((h, w), bool), cam_l, cam_r)


def run(mesh, scenes, cfg):
    rgbs_l = np.stack([s[0] for s in scenes])
    masks_l = np.stack([s[1] for s in scenes])
    rgbs_r = np.stack([s[2] for s in scenes])
    masks_r = np.stack([s[3] for s in scenes])
    cams_l = stack_cameras([s[4] for s in scenes])
    cams_r = stack_cameras([s[5] for s in scenes])

    out = twoview_batch_sharded(mesh, rgbs_l, masks_l, rgbs_r, masks_r,
                                cams_l, cams_r, cfg)
    np.asarray(out)  # warm + sync
    t0 = time.time()
    out = twoview_batch_sharded(mesh, rgbs_l + 0.01, masks_l, rgbs_r,
                                masks_r, cams_l, cams_r, cfg)
    np.asarray(out)
    return time.time() - t0


def main():
    rng = np.random.default_rng(0)
    cfg = TwoViewConfig(window_radius=2, min_depth=40.0, max_depth=90.0,
                        num_depth_levels=12, image_scale=1.0,
                        weights=WeightConfig(kind="geodesic"))
    scenes = [scene(rng, 64, 96) for _ in range(2)]

    n_dev = len(jax.devices())
    t1 = run(make_mesh(1, 1), scenes, cfg)
    tn = run(make_mesh(2, n_dev // 2) if n_dev >= 2 else make_mesh(1, 1),
             scenes, cfg)
    print(f"1 device: {t1:.3f}s   {n_dev} devices: {tn:.3f}s   "
          f"ratio: {t1 / tn:.2f}x")


if __name__ == "__main__":
    main()
