"""Weighted NCC / SAD matching costs over depth-swept match points.

Replaces the reference's per-pixel scalar loops (``TwoViewStereo::cost_ncc``
twoviewstereo.cpp:909-977, ``cost_sad`` 864-905, and the multi-view
``cost_ncc`` multiviewstereo.cpp:113-189) with a single-pass accumulator
formulation over the window-tap axis, vectorized over every (depth, pixel)
lane at once.

Key algebra: the reference computes weighted means first and then correlates
*weighted* gray values minus the means (weights multiply the gray values
inside the correlation — an idiosyncrasy that must be replicated for parity).
Expanding those sums gives a one-pass form over seven accumulators:

  sum1 = S_lr - meanL*S_r - meanR*S_l + N*meanL*meanR
  sum2 = S_ll - 2*meanL*S_l + N*meanL^2
  sum3 = S_rr - 2*meanR*S_r + N*meanR^2

with S_w = sum(w), S_l = sum(w*gL), S_ll = sum((w*gL)^2), ... over valid taps
and N the number of valid taps.  This avoids a second pass over the window.

Tap validity matches the reference exactly:
 * two-view: both masks WHITE (right mask looked up at truncated coords),
   both samples valid under VectorImage::sample's ``x+1 < w`` rule (left is
   sampled at integer coords but still via sample(), twoviewstereo.cpp:927),
   weight > 1e-10;
 * multi-view: in-bounds pixel() lookups (truncated coords), no mask checks
   (the #if 0 blocks at multiviewstereo.cpp:124-130), weight > 1e-10.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .sampling import shifted_windows, pixel_lookup

_WEPS = 1e-10


def gather_patches(img, iy0, ix0, size: int):
    """Gather a ``[size, size]`` patch per pixel with top-left (iy0, ix0).

    img: [H, W]; iy0/ix0: [...] int32 (may be out of bounds — values are
    clamped; callers must mask validity separately).
    Returns patches ``[..., size, size]``.
    """
    h, w = img.shape
    padded = jnp.pad(img, size)
    ys = jnp.clip(iy0 + size, 0, h + size).astype(jnp.int32)
    xs = jnp.clip(ix0 + size, 0, w + size).astype(jnp.int32)
    batch_shape = ys.shape
    ys_f = ys.reshape(-1)
    xs_f = xs.reshape(-1)
    out = jax.vmap(
        lambda y, x: lax.dynamic_slice(padded, (y, x), (size, size))
    )(ys_f, xs_f)
    return out.reshape(batch_shape + (size, size))


def _left_windows(gray_ref, mask_ref, radius: int, *, use_sample: bool):
    """Static per-tap left values/validity: ``[S, S, H, W]`` each.

    use_sample=True applies VectorImage::sample's validity (x+1 < w) as in
    the two-view engine; False uses pixel() bounds as in multi-view.
    """
    win, inb = shifted_windows(gray_ref, radius)
    if use_sample:
        # sample() at integer coords: needs x >= 0 and x + 1 < w, i.e. the
        # last row/column of the image is not sampleable.
        last, _ = shifted_windows(
            jnp.ones(gray_ref.shape, bool).at[-1, :].set(False)
            .at[:, -1].set(False), radius, fill=False)
        sval = inb & last
    else:
        sval = inb
    maskw, _ = shifted_windows(mask_ref, radius, fill=False)
    return win, sval, maskw


def twoview_cost_plane(gray_ref, left_vals, left_valid, left_mask,
                       gray_oth, mask_oth, weights, xy, valid_xy, *,
                       radius: int, max_color_diff: float = 120.0,
                       bad_ret: float = 1000.0, use_masks: bool = True,
                       mvs_mode: bool = False):
    """Matching cost for one depth plane.

    left_vals/left_valid/left_mask: [S, S, H, W] (from ``_left_windows``).
    weights: [S, S, H, W].  xy: [H, W, 2] match coords in the other image
    (fractional); valid_xy: [H, W].

    Returns cost [H, W]:
      * two-view mode: min(max_color_diff, 255*(1-|ncc|)), bad_ret for empty
        windows, +inf where valid_xy is False (skipped depth).
      * mvs_mode: raw NCC in [-1, 1], 0 for empty windows, -inf where
        valid_xy is False (peaks use > threshold, so -inf never passes).
    """
    size = 2 * radius + 1
    h, w = gray_ref.shape
    x2 = xy[..., 0]
    y2 = xy[..., 1]
    dtype = gray_ref.dtype

    # All 121 window taps as one [S, S, H, W] tensor pass (no per-tap loop:
    # keeps the HLO graph small and lets XLA fuse the whole reduction).
    rows = jnp.arange(-radius, radius + 1, dtype=dtype)
    cols = rows

    lv = left_valid
    if use_masks:
        lv = lv & left_mask

    if mvs_mode:
        xx = x2[None, None] + cols[None, :, None, None]
        yy = y2[None, None] + rows[:, None, None, None]
        gr, rv = pixel_lookup(gray_oth, xx, yy)
    else:
        # Shared-fraction bilinear: one patch gather of size (S+1, S+1)
        # covers all taps' 4 corners.
        ix0 = jnp.floor(x2).astype(jnp.int32)
        iy0 = jnp.floor(y2).astype(jnp.int32)
        fx = (x2 - ix0).astype(dtype)
        fy = (y2 - iy0).astype(dtype)
        patches = gather_patches(gray_oth, iy0 - radius, ix0 - radius,
                                 size + 1)                 # [H, W, S+1, S+1]
        patches = jnp.moveaxis(patches, (2, 3), (0, 1))    # [S+1, S+1, H, W]
        gr = ((1 - fy) * (1 - fx) * patches[:size, :size]
              + (1 - fy) * fx * patches[:size, 1:]
              + fy * (1 - fx) * patches[1:, :size]
              + fy * fx * patches[1:, 1:])
        xx = x2[None, None] + cols[None, :, None, None]
        yy = y2[None, None] + rows[:, None, None, None]
        rv = (xx >= 0) & (yy >= 0) & (xx + 1 < w) & (yy + 1 < h)
        if use_masks:
            mask_patches = gather_patches(
                mask_oth.astype(dtype), iy0 - radius, ix0 - radius, size)
            rv = rv & (jnp.moveaxis(mask_patches, (2, 3), (0, 1)) > 0.5)

    return ncc_accumulate(left_vals, lv, weights, gr, rv, valid_xy,
                          mvs_mode=mvs_mode,
                          max_color_diff=max_color_diff, bad_ret=bad_ret)


def ncc_accumulate(left_vals, lv, weights, gr, rv, valid_xy, *,
                   mvs_mode: bool, max_color_diff: float = 120.0,
                   bad_ret: float = 1000.0):
    """Seven-accumulator weighted-NCC epilogue over the tap axes.

    left_vals/lv/weights/gr/rv: [S, S, H, W] (lv already includes any
    mask term).  Shared by the gather-based cost planes above and the
    warp-tap formulation (ops/warp.warp_taps_nearest) of the MVS fast
    path."""
    dtype = left_vals.dtype
    m = (lv & rv & (weights > _WEPS)).astype(dtype)
    wl = weights * left_vals
    wr = weights * gr
    axes = (0, 1)
    S_w = jnp.sum(m * weights, axis=axes)
    S_l = jnp.sum(m * wl, axis=axes)
    S_r = jnp.sum(m * wr, axis=axes)
    S_ll = jnp.sum(m * wl * wl, axis=axes)
    S_rr = jnp.sum(m * wr * wr, axis=axes)
    S_lr = jnp.sum(m * wl * wr, axis=axes)
    N = jnp.sum(m, axis=axes)

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
        return jnp.where(valid_xy, cost, -jnp.inf)
    else:
        denom = jnp.sqrt(sum2 * sum3)
        v = 255.0 * (1.0 - jnp.abs(sum1) / denom)
        # std::min(120, NaN) returns 120 — replicate NaN -> max_color_diff.
        v = jnp.where(jnp.isnan(v), max_color_diff,
                      jnp.minimum(max_color_diff, v))
        cost = jnp.where(have, v, bad_ret)
        return jnp.where(valid_xy, cost, jnp.inf)


def sad_cost_plane(gray_ref, left_vals, left_valid, left_mask,
                   gray_oth, mask_oth, weights, xy, valid_xy, *,
                   radius: int, max_color_diff: float = 120.0,
                   bad_ret: float = 1000.0):
    """Weighted truncated-SAD cost (``cost_sad`` twoviewstereo.cpp:864-905).

    Requires > 4 valid pixels, else bad_ret.
    """
    size = 2 * radius + 1
    h, w = gray_ref.shape
    x2, y2 = xy[..., 0], xy[..., 1]
    dtype = gray_ref.dtype

    ix0 = jnp.floor(x2).astype(jnp.int32)
    iy0 = jnp.floor(y2).astype(jnp.int32)
    fx = (x2 - ix0).astype(dtype)
    fy = (y2 - iy0).astype(dtype)
    patches = gather_patches(gray_oth, iy0 - radius, ix0 - radius, size + 1)
    mask_patches = gather_patches(mask_oth.astype(dtype),
                                  iy0 - radius, ix0 - radius, size)

    rows = jnp.arange(-radius, radius + 1, dtype=dtype)
    xx = x2[None, None] + rows[None, :, None, None]
    yy = y2[None, None] + rows[:, None, None, None]
    # NOTE: reference cost_sad samples left bilinearly but looks the right
    # value up with pixel() (twoviewstereo.cpp:882-885).
    gr, rv = pixel_lookup(gray_oth, xx, yy)
    rv = rv & (jnp.moveaxis(mask_patches, (2, 3), (0, 1)) > 0.5)
    lv = left_valid & left_mask
    m = (lv & rv & (weights > _WEPS)).astype(dtype)
    diff = jnp.minimum(max_color_diff, jnp.abs(left_vals - gr))
    S = jnp.sum(m * weights * diff, axis=(0, 1))
    S_w = jnp.sum(m * weights, axis=(0, 1))
    N = jnp.sum(m, axis=(0, 1))

    ok = (N > 4) & (S_w > _WEPS)
    cost = jnp.where(ok, S / jnp.where(ok, S_w, 1.0), bad_ret)
    return jnp.where(valid_xy, cost, jnp.inf)
