"""Depth-sweep geometry: match-point generation for the cost volume.

The reference rasterizes per-pixel refractive epipolar *curves* with a
Bresenham iterator (``epipolarCurve`` twoviewstereo.cpp:999-1054) — ragged,
sequential, branchy.  The TPU-native engine evaluates the matching cost at
the ``num_depth_levels`` sampled depths directly (the reference ships the
same dense variant in-tree at twoviewstereo.cpp:308-329): identical extrema,
but a static ``[D, H, W]`` shape that XLA can tile.

Geometry parity:
* rays through pixel centers ``(x + 0.5) / image_scale`` (twoviewstereo.cpp:
  275),
* depth planes orthogonal to the view's principal ray through
  ``C + normal * depth`` (``pointFromDepth`` twoviewstereo.cpp:987-995),
* non-uniform two-view depth spacing ``t / (5 - 4t)`` (``depthFromLabel``
  twoviewstereo.cpp:981-985) vs. uniform multi-view spacing
  (multiviewstereo.cpp:733-736),
* projected match coords ``x * image_scale - 0.5`` (twoviewstereo.cpp:
  314-315).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.camera import Camera, project, unproject, principal_ray
from ..geometry.rays import intersect_plane


def depth_labels_twoview(min_depth, max_depth, num_levels: int,
                         dtype=jnp.float32):
    """Non-uniform sampling t/(5-4t) (twoviewstereo.cpp:981-985)."""
    labels = jnp.arange(num_levels, dtype=dtype)
    t = labels / (num_levels - 1.0)
    t = t / (5.0 - 4.0 * t)
    return min_depth * (1.0 - t) + max_depth * t


def depth_labels_uniform(min_depth, max_depth, num_levels: int,
                         dtype=jnp.float32):
    """Uniform sampling (multiviewstereo.cpp:733-736)."""
    labels = jnp.arange(num_levels, dtype=dtype)
    t = labels / (num_levels - 1.0)
    return min_depth * (1.0 - t) + max_depth * t


def pixel_rays(cam: Camera, height: int, width: int, image_scale: float,
               *, enable_refraction=True, enable_distortion=True,
               dtype=jnp.float32, row0=0):
    """Unprojected rays for every pixel center of the scaled image.

    Returns (origins [H, W, 3], directions [H, W, 3]) in world coords.

    ``row0`` offsets the pixel rows (may be traced) — used by the
    row-sharded engine where each device owns a block of global rows.
    """
    ys = (jnp.asarray(row0).astype(dtype)
          + jnp.arange(height, dtype=dtype) + 0.5) / image_scale
    xs = (jnp.arange(width, dtype=dtype) + 0.5) / image_scale
    xg, yg = jnp.meshgrid(xs, ys)                   # [H, W]
    xy = jnp.stack([xg, yg], axis=-1)
    return unproject(cam, xy, enable_refraction=enable_refraction,
                     enable_distortion=enable_distortion)


def point_from_depth(ray_o, ray_d, center, normal, depth):
    """``pointFromDepth``: intersect the ray with the fronto-parallel plane
    at ``depth`` along ``normal`` through ``center``.

    Shapes broadcast; returns (points [..., 3], valid [...]).
    """
    dist = jnp.sum(normal * center, axis=-1) + depth
    return intersect_plane(ray_o, ray_d, normal, dist)


def sweep_points(cam_ref: Camera, ray_o, ray_d, depths):
    """3D points along each pixel ray at each depth plane of ``cam_ref``.

    ray_o/ray_d: [H, W, 3]; depths: [D].
    Returns (points [D, H, W, 3], valid [D, H, W]).
    """
    o, d = principal_ray(cam_ref)
    normal = d.astype(ray_o.dtype)
    center = cam_ref.C.astype(ray_o.dtype)
    dists = jnp.sum(normal * center) + depths          # [D]
    nd = jnp.sum(normal * ray_d, axis=-1)              # [H, W]
    nd_safe = jnp.where(jnp.abs(nd) < 1e-10, 1.0, nd)
    no = jnp.sum(normal * ray_o, axis=-1)              # [H, W]
    t = (dists[:, None, None] - no[None]) / nd_safe[None]   # [D, H, W]
    valid = (jnp.abs(nd)[None] >= 1e-10) & (t >= 1e-10)
    pts = ray_o[None] + t[..., None] * ray_d[None]
    return pts, valid


def match_points(cam_oth: Camera, pts, valid, image_scale, *,
                 enable_refraction=True, enable_distortion=True,
                 quartic_iters=30):
    """Project sweep points into the other view's scaled pixel grid.

    Returns (xy [..., 2] at scaled coords with the -0.5 center offset,
    valid [...]).
    """
    xy_full, pvalid = project(cam_oth, pts,
                              enable_refraction=enable_refraction,
                              enable_distortion=enable_distortion,
                              quartic_iters=quartic_iters)
    xy = xy_full * image_scale - 0.5
    return xy, valid & pvalid & jnp.all(jnp.isfinite(xy), axis=-1)
