"""Batched device-side SURF (Bay et al. 2006).

Replaces OpenCV's ``cv::SURF`` used by the reference (surf.cpp:99-101,
default parameters: Hessian threshold 100, 4 octaves, 2 layers, 64-dim
descriptors).  TPU-native design:

* integral image by two cumsums,
* box-filter Dxx/Dyy/Dxy responses for *every pixel and scale at once* as
  shifted differences of the integral image (pure pad+slice — no gathers),
* det(H) = Dxx*Dyy - (0.9*Dxy)^2 with filter-size normalization,
* 3x3x3 scale-space non-maximum suppression,
* per-keypoint Haar orientation (sliding 60-degree window) and 4x4x4
  sum-of-Haar descriptor, vectorized over keypoints with vmap.

The keypoint extraction step (thresholded NMS -> coordinate list) is the
only host sync; everything else is jittable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def integral_image(gray):
    ii = jnp.cumsum(jnp.cumsum(gray, axis=0), axis=1)
    return jnp.pad(ii, ((1, 0), (1, 0)))


def _box_sum(ii, y0, x0, y1, x1):
    """Sum of gray over rows [y0, y1), cols [x0, x1) — offsets relative to
    each pixel; returns an [H, W] map via shifted views of the padded
    integral image."""
    h = ii.shape[0] - 1
    w = ii.shape[1] - 1
    pad = 256  # generous: max filter half-size
    iipad = jnp.pad(ii, ((pad, pad), (pad, pad)), mode="edge")

    def at(dy, dx):
        return iipad[pad + dy: pad + dy + h, pad + dx: pad + dx + w]

    return (at(y1, x1) - at(y0, x1) - at(y1, x0) + at(y0, x0))


def _hessian_maps(ii, size: int):
    """Dxx, Dyy, Dxy box responses for one filter size (odd, >= 9)."""
    l = size // 3                 # lobe size
    w2 = size // 2
    # Dyy: (size)-tall x (2l-1)-wide box with the middle l-tall lobe
    # weighted -2 -> whole - 3*middle (OpenSURF layout)
    whole = _box_sum(ii, -w2, -(l - 1), w2 + 1, l)
    mid = _box_sum(ii, -(l // 2), -(l - 1), l // 2 + 1, l)
    dyy = whole - 3.0 * mid
    whole_t = _box_sum(ii, -(l - 1), -w2, l, w2 + 1)
    mid_t = _box_sum(ii, -(l - 1), -(l // 2), l, l // 2 + 1)
    dxx = whole_t - 3.0 * mid_t
    # Dxy: four l x l lobes
    pp = _box_sum(ii, 1, 1, l + 1, l + 1)
    mm = _box_sum(ii, -l, -l, 0, 0)
    pm = _box_sum(ii, 1, -l, l + 1, 0)
    mp = _box_sum(ii, -l, 1, 0, l + 1)
    dxy = pp + mm - pm - mp

    inv_area = 1.0 / (size * size)
    return dxx * inv_area, dyy * inv_area, dxy * inv_area


def hessian_pyramid(gray, n_octaves: int = 4, n_layers: int = 4):
    """det(H) maps for the standard SURF filter sizes.

    Returns (dets [L, H, W], sizes [L], laplacian signs [L, H, W]).
    """
    ii = integral_image(gray)
    # canonical SURF sizes: octave o: 3*(2^(o+1)*(i+1)+1)
    sizes = []
    for o in range(n_octaves):
        for i in range(n_layers):
            sizes.append(3 * ((2 ** (o + 1)) * (i + 1) + 1))
    sizes = sorted(set(sizes))

    dets = []
    signs = []
    for s in sizes:
        dxx, dyy, dxy = _hessian_maps(ii, s)
        det = dxx * dyy - (0.9 * dxy) ** 2
        dets.append(det)
        signs.append(dxx + dyy >= 0)
    return jnp.stack(dets), np.array(sizes), jnp.stack(signs)


def detect_keypoints(gray, threshold: float = 100.0, n_octaves: int = 4,
                     n_layers: int = 4, max_keypoints: int = 1000):
    """Thresholded 3x3x3 scale-space NMS.  Returns (xy [K, 2],
    scale_sizes [K], signs [K]) as numpy (host sync point)."""
    # Normalize 0..255 gray like OpenCV (response scaling matches box size
    # normalization in _hessian_maps).
    dets, sizes, signs = hessian_pyramid(gray, n_octaves, n_layers)
    L, h, w = dets.shape

    pad = jnp.pad(dets, ((1, 1), (1, 1), (1, 1)),
                  constant_values=-jnp.inf)
    neigh_max = jnp.full(dets.shape, -jnp.inf)
    for dl in range(3):
        for dy in range(3):
            for dx in range(3):
                if (dl, dy, dx) == (1, 1, 1):
                    continue
                neigh_max = jnp.maximum(
                    neigh_max, pad[dl:dl + L, dy:dy + h, dx:dx + w])
    is_max = (dets > neigh_max) & (dets > threshold)

    # border suppression: filter must fit
    for li, s in enumerate(sizes):
        b = s // 2 + 1
        m = jnp.zeros((h, w), bool).at[b:h - b, b:w - b].set(True)
        is_max = is_max.at[li].set(is_max[li] & m)

    is_max = np.asarray(is_max)
    dets_np = np.asarray(dets)
    ls, ys, xs = np.where(is_max)
    if len(ls) > max_keypoints:
        order = np.argsort(-dets_np[ls, ys, xs])[:max_keypoints]
        ls, ys, xs = ls[order], ys[order], xs[order]
    signs_np = np.asarray(signs)
    return (np.stack([xs, ys], -1).astype(np.float64), sizes[ls],
            signs_np[ls, ys, xs], dets_np[ls, ys, xs])


# ---------------------------------------------------------------------------
# Orientation + descriptor (vectorized over keypoints)
# ---------------------------------------------------------------------------

def _haar_responses(ii, xk, yk, scale):
    """Haar dx/dy at 109 circle samples of radius 6*scale around (xk, yk).

    Integer arithmetic on rounded sample positions; returns (dx, dy,
    angles_weights) arrays [109].
    """
    offs = [(i, j) for i in range(-6, 7) for j in range(-6, 7)
            if i * i + j * j < 36]
    offs = np.array(offs)  # [109, 2] (i=x, j=y)
    s = jnp.round(scale).astype(jnp.int32)
    h = ii.shape[0] - 1
    w = ii.shape[1] - 1

    def box(y0, x0, y1, x1):
        y0 = jnp.clip(y0, 0, h)
        x0 = jnp.clip(x0, 0, w)
        y1 = jnp.clip(y1, 0, h)
        x1 = jnp.clip(x1, 0, w)
        return (ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0])

    xi = jnp.round(xk).astype(jnp.int32) + offs[:, 0] * s
    yi = jnp.round(yk).astype(jnp.int32) + offs[:, 1] * s
    # 4s x 2s Haar wavelets
    dx = (box(yi - 2 * s, xi, yi + 2 * s, xi + 2 * s)
          - box(yi - 2 * s, xi - 2 * s, yi + 2 * s, xi))
    dy = (box(yi, xi - 2 * s, yi + 2 * s, xi + 2 * s)
          - box(yi - 2 * s, xi - 2 * s, yi, xi + 2 * s))
    g = jnp.exp(-(offs[:, 0] ** 2 + offs[:, 1] ** 2) / (2 * 2.5 ** 2))
    return dx * g, dy * g


def _orientation(ii, xk, yk, scale):
    dx, dy = _haar_responses(ii, xk, yk, scale)
    ang = jnp.arctan2(dy, dx)
    # sliding pi/3 window, 42 test angles
    test = jnp.linspace(-jnp.pi, jnp.pi, 42, endpoint=False)

    def window_sum(a0):
        d = (ang - a0 + jnp.pi) % (2 * jnp.pi) - jnp.pi
        m = (d >= 0) & (d < jnp.pi / 3)
        return jnp.sum(jnp.where(m, dx, 0.0)), jnp.sum(
            jnp.where(m, dy, 0.0))

    sx, sy = jax.vmap(window_sum)(test)
    mag = sx * sx + sy * sy
    k = jnp.argmax(mag)
    return jnp.arctan2(sy[k], sx[k])


def _descriptor(ii, xk, yk, scale, angle):
    """64-dim SURF descriptor: 4x4 subregions x (sum dx, sum|dx|, sum dy,
    sum |dy|) of 5x5 Haar samples, rotated to ``angle``."""
    s = scale
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    h = ii.shape[0] - 1
    w = ii.shape[1] - 1

    # sample grid: 20x20 samples at spacing s, centered
    us = (np.arange(20) - 9.5)
    u, v = np.meshgrid(us, us, indexing="ij")   # v = x dir, u = y dir
    u = u.ravel()
    v = v.ravel()

    # rotated sample positions
    xs = xk + (v * ca - u * sa) * s
    ys = yk + (v * sa + u * ca) * s
    si = jnp.maximum(jnp.round(s).astype(jnp.int32), 1)
    xi = jnp.round(xs).astype(jnp.int32)
    yi = jnp.round(ys).astype(jnp.int32)

    def box(y0, x0, y1, x1):
        y0 = jnp.clip(y0, 0, h)
        x0 = jnp.clip(x0, 0, w)
        y1 = jnp.clip(y1, 0, h)
        x1 = jnp.clip(x1, 0, w)
        return (ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0])

    rx = (box(yi - si, xi, yi + si, xi + si)
          - box(yi - si, xi - si, yi + si, xi))
    ry = (box(yi, xi - si, yi + si, xi + si)
          - box(yi - si, xi - si, yi, xi + si))
    # rotate responses into keypoint frame
    dx = ca * rx + sa * ry
    dy = -sa * rx + ca * ry

    g = jnp.exp(-(u ** 2 + v ** 2) / (2 * 3.3 ** 2))
    dx = dx * g
    dy = dy * g

    # 4x4 subregions of 5x5 samples
    dx = dx.reshape(4, 5, 4, 5)
    dy = dy.reshape(4, 5, 4, 5)
    feats = jnp.stack([
        dx.sum(axis=(1, 3)),
        jnp.abs(dx).sum(axis=(1, 3)),
        dy.sum(axis=(1, 3)),
        jnp.abs(dy).sum(axis=(1, 3)),
    ], axis=-1)                                   # [4, 4, 4]
    d = feats.reshape(-1)
    return d / jnp.maximum(jnp.linalg.norm(d), 1e-10)


@dataclass
class SurfFeatureSet:
    xy: np.ndarray            # [K, 2]
    size: np.ndarray          # [K] filter sizes
    angle: np.ndarray         # [K] radians
    response: np.ndarray      # [K]
    sign: np.ndarray          # [K] laplacian sign
    descriptors: np.ndarray   # [K, 64]


def detect_and_describe(gray, threshold: float = 100.0,
                        max_keypoints: int = 1000,
                        upright: bool = False) -> SurfFeatureSet:
    """Full SURF pipeline on one gray image (0..255 floats)."""
    gray = jnp.asarray(gray, jnp.float32)
    xy, sizes, signs, resp = detect_keypoints(
        gray, threshold, max_keypoints=max_keypoints)
    ii = integral_image(gray)

    if len(xy) == 0:
        return SurfFeatureSet(xy=np.zeros((0, 2)), size=np.zeros(0),
                              angle=np.zeros(0), response=np.zeros(0),
                              sign=np.zeros(0, bool),
                              descriptors=np.zeros((0, 64)))

    scales = jnp.asarray(sizes, jnp.float32) * 1.2 / 9.0
    xk = jnp.asarray(xy[:, 0], jnp.float32)
    yk = jnp.asarray(xy[:, 1], jnp.float32)

    if upright:
        angles = jnp.zeros(len(xy), jnp.float32)
    else:
        angles = jax.vmap(lambda x, y, s: _orientation(ii, x, y, s))(
            xk, yk, scales)
    descs = jax.vmap(lambda x, y, s, a: _descriptor(ii, x, y, s, a))(
        xk, yk, scales, angles)

    return SurfFeatureSet(xy=xy, size=sizes.astype(np.float64),
                          angle=np.asarray(angles, np.float64),
                          response=resp, sign=signs,
                          descriptors=np.asarray(descs, np.float64))
