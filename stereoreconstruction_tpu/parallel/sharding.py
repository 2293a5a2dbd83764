"""Device-mesh sharding for the stereo engines.

The reference parallelizes with OpenMP/TBB row loops inside one process
(twoviewstereo.cpp:265, multiviewstereo.cpp:543-555).  The TPU-native
equivalent is SPMD over a ``jax.sharding.Mesh``:

* axis "view": data-parallel over view pairs / views (embarrassingly
  parallel, no communication),
* axis "row": spatial partition of the pixel grid; XLA GSPMD inserts the
  halo exchanges required by the window ops (weights, NCC) and the gathers
  of the epipolar warp automatically.

``twoview_batch_sharded`` is the multi-chip entry: a batch of view pairs,
sharded (view, row), producing both depth maps per pair with cross-check.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TwoViewConfig
from ..geometry.camera import Camera
from ..stereo.twoview import (
    compute_depth_map_oneview,
    cross_check_pair,
)


def make_mesh(n_view: int, n_row: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:n_view * n_row]).reshape(n_view, n_row)
    return Mesh(devices, ("view", "row"))


def stack_cameras(cams: Sequence[Camera]) -> Camera:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def _pair_fn(rgb_l, mask_l, rgb_r, mask_r, cam_l, cam_r, cfg,
             enable_refraction, enable_distortion):
    gray_l = 0.11 * rgb_l[..., 0] + 0.59 * rgb_l[..., 1] + 0.3 * rgb_l[..., 2]
    gray_r = 0.11 * rgb_r[..., 0] + 0.59 * rgb_r[..., 1] + 0.3 * rgb_r[..., 2]
    dl = compute_depth_map_oneview(
        rgb_l, gray_l, mask_l, gray_r, mask_r, cam_l, cam_r, cfg,
        enable_refraction=enable_refraction,
        enable_distortion=enable_distortion)
    dr = compute_depth_map_oneview(
        rgb_r, gray_r, mask_r, gray_l, mask_l, cam_r, cam_l, cfg,
        enable_refraction=enable_refraction,
        enable_distortion=enable_distortion)
    dl, dr = cross_check_pair(dl, dr, cam_l, cam_r, cfg,
                              enable_refraction=enable_refraction,
                              enable_distortion=enable_distortion)
    return jnp.stack([dl, dr])


def twoview_batch_sharded(mesh: Mesh, rgbs_l, masks_l, rgbs_r, masks_r,
                          cams_l: Camera, cams_r: Camera,
                          cfg: TwoViewConfig, *,
                          enable_refraction: bool = True,
                          enable_distortion: bool = True):
    """Depth maps for a batch of view pairs, sharded over (view, row).

    rgbs_*: [P, H, W, 3]; masks_*: [P, H, W]; cams_*: stacked Camera with
    leading axis P.  Returns [P, 2, H, W] cross-checked depth maps.
    """
    img_sh = NamedSharding(mesh, P("view", "row"))
    rgb_sh = NamedSharding(mesh, P("view", "row", None, None))
    cam_sh = NamedSharding(mesh, P("view"))
    out_sh = NamedSharding(mesh, P("view", None, "row"))

    rgbs_l = jax.device_put(jnp.asarray(rgbs_l, jnp.float32), rgb_sh)
    rgbs_r = jax.device_put(jnp.asarray(rgbs_r, jnp.float32), rgb_sh)
    masks_l = jax.device_put(jnp.asarray(masks_l, bool), img_sh)
    masks_r = jax.device_put(jnp.asarray(masks_r, bool), img_sh)
    put_cam = lambda c: jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x, jnp.float32), cam_sh), c)
    cams_l = put_cam(cams_l)
    cams_r = put_cam(cams_r)

    fn = functools.partial(_pair_fn, cfg=cfg,
                           enable_refraction=enable_refraction,
                           enable_distortion=enable_distortion)
    batched = jax.jit(jax.vmap(fn), out_shardings=out_sh)
    with mesh:
        return batched(rgbs_l, masks_l, rgbs_r, masks_r, cams_l, cams_r)
