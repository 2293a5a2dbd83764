"""Gather-free fast cost volume: warp-first weighted NCC.

The exact-parity path samples the *other* image at 121 window taps around
each epipolar match point (other-space windows) — inherently gather-bound on
TPU.  The fast path warps the other image onto the reference grid once per
depth (``ops/warp.py``, MXU matmuls) and takes the support window in
*reference* space over the warped plane:

    exact:  cost taps  other(x2(p) + col, y2(p) + row)
    fast:   cost taps  other(x2(p + (row, col)))    [warp of the neighbor]

For locally-affine epipolar maps these agree to first order; this is the
standard plane-sweep formulation (fronto-parallel support in the reference
view).  WTA depth picks are expected to match the exact path almost
everywhere (validated on the bunny set); the exact path remains available
for oracle-level parity.

All window taps are pad+slice shifts — zero gathers in the whole plane.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .warp import warp_rows_banded_multi, _tri

_WEPS = 1e-10


class RefView(NamedTuple):
    """Per-reference-view precompute shared by all depth planes."""
    gray_pad: jnp.ndarray      # [H+2R, W+2R]
    mask_pad: jnp.ndarray      # [H+2R, W+2R] bool
    inb_pad: jnp.ndarray       # [H+2R, W+2R] bool (in-image)
    weights: jnp.ndarray       # [S, S, H, W]
    radius: int


def make_ref_view(gray_ref, mask_ref, weights, radius: int,
                  inb=None) -> RefView:
    """``inb`` overrides the in-image sample-validity plane (row-sharded
    blocks pass one derived from *global* row indices)."""
    gray_pad = jnp.pad(gray_ref, radius)
    mask_pad = jnp.pad(mask_ref, radius, constant_values=False)
    if inb is None:
        inb = jnp.ones(gray_ref.shape, bool)
        # sample() validity excludes the last row/column (x+1 < w)
        inb = inb.at[-1, :].set(False).at[:, -1].set(False)
    inb_pad = jnp.pad(inb, radius, constant_values=False)
    return RefView(gray_pad=gray_pad, mask_pad=mask_pad, inb_pad=inb_pad,
                   weights=weights, radius=radius)


def warp_other(gray_oth, mask_oth, x2, y2, valid_xy, *, band: int = 64,
               row_block: int = 16, sampling: str = "bilinear"):
    """Warp the other view's gray + mask onto the reference grid.

    Returns (warped [H, W], wvalid [H, W] bool).
    The mask is warped with the same kernel and thresholded at ~1 (a tap
    near a masked pixel is rejected, mirroring the reference's integer
    mask lookups).

    sampling: "bilinear" = VectorImage::sample (two-view cost) in bf16
    (MXU); "nearest" = VectorImage::pixel int-cast (MVS cost,
    multiviewstereo.cpp:113-189) in f32 — the 0/1 box matrix copies exact
    source values, keeping NCC peaks' 0.95-threshold behavior faithful.
    """
    x2s = jnp.where(valid_xy, x2, -1e6)
    y2s = jnp.where(valid_xy, y2, -1e6)
    stacked = jnp.stack([gray_oth,
                         mask_oth.astype(gray_oth.dtype) * 255.0])

    # one interpolation-matrix build + one MXU contraction for both
    # channels (the x-triangle matrix dominates the warp's VPU cost)
    vals, valid = warp_rows_banded_multi(
        stacked, x2s, y2s, band=band, row_block=row_block,
        sampling=sampling,
        compute_dtype=(jnp.bfloat16 if sampling == "bilinear"
                       else jnp.float32))
    warped = vals[0]
    wmask = vals[1] > 254.0
    wvalid = valid & wmask & valid_xy
    return warped, wvalid


def fast_cost_plane(ref: RefView, warped, wvalid, *,
                    max_color_diff: float = 120.0, bad_ret: float = 1000.0,
                    mvs_mode: bool = False, use_masks: bool = True):
    """Weighted-NCC cost of one warped depth plane: [H, W].

    Same accumulator algebra as ops/ncc.twoview_cost_plane; taps are shifts.
    """
    radius = ref.radius
    size = 2 * radius + 1
    h = ref.gray_pad.shape[0] - 2 * radius
    w = ref.gray_pad.shape[1] - 2 * radius
    dtype = warped.dtype

    wpad = jnp.pad(warped, radius)
    wvpad = jnp.pad(wvalid, radius, constant_values=False)

    zero = jnp.zeros((h, w), dtype)
    S_w, S_l, S_r, S_ll, S_rr, S_lr, N = (zero,) * 7

    for s in range(size):
        for t in range(size):
            wgt = ref.weights[s, t]
            gl = ref.gray_pad[s:s + h, t:t + w]
            lv = ref.inb_pad[s:s + h, t:t + w]
            if use_masks:
                lv = lv & ref.mask_pad[s:s + h, t:t + w]
            gr = wpad[s:s + h, t:t + w]
            rv = wvpad[s:s + h, t:t + w]

            m = (lv & rv & (wgt > _WEPS)).astype(dtype)
            wl = wgt * gl
            wr = wgt * gr
            S_w = S_w + m * wgt
            S_l = S_l + m * wl
            S_r = S_r + m * wr
            S_ll = S_ll + m * wl * wl
            S_rr = S_rr + m * wr * wr
            S_lr = S_lr + m * wl * wr
            N = N + m

    have = S_w > _WEPS
    S_w_safe = jnp.where(have, S_w, 1.0)
    meanL = S_l / S_w_safe
    meanR = S_r / S_w_safe
    sum1 = S_lr - meanL * S_r - meanR * S_l + N * meanL * meanR
    sum2 = S_ll - 2 * meanL * S_l + N * meanL * meanL
    sum3 = S_rr - 2 * meanR * S_r + N * meanR * meanR

    if mvs_mode:
        denom_ok = sum2 * sum3 >= _WEPS
        ncc = sum1 / jnp.sqrt(jnp.where(denom_ok, sum2 * sum3, 1.0))
        cost = jnp.where(have & denom_ok, ncc, 0.0)
        # pixels whose own warp sample is invalid were never on the curve
        return jnp.where(wvalid, cost, -jnp.inf)
    else:
        denom = jnp.sqrt(sum2 * sum3)
        v = 255.0 * (1.0 - jnp.abs(sum1) / denom)
        v = jnp.where(jnp.isnan(v), max_color_diff,
                      jnp.minimum(max_color_diff, v))
        cost = jnp.where(have, v, bad_ret)
        return jnp.where(wvalid, cost, jnp.inf)
