"""Gather-free bilinear warping via MXU matmul contractions.

TPU gathers lower to near-scalar loops (measured ~1 us per slice on v5e via
XLA), which made the direct epipolar patch-gather cost volume gather-bound.
This module reformulates the per-depth warp

    warped[p] = bilinear(other, x2[p], y2[p])

as two interpolation contractions with *dense* triangle-kernel matrices:

    A[p, ky]  = sum_kx other[ky, kx] * tri(kx - x2[p])     (MXU matmul)
    warped[p] = sum_ky A[p, ky]     * tri(ky - y2[p])      (VPU reduce)

tri(d) = max(0, 1 - |d|) reproduces bilinear interpolation exactly (up to
bf16 rounding of the *values*; the coordinates stay f32).  The matmul runs
in bf16 on the MXU with f32 accumulation — exactly where the FLOPs belong on
this hardware.  Out-of-bounds positions produce zero weight rows and are
flagged invalid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _tri(diff):
    return jnp.maximum(0.0, 1.0 - jnp.abs(diff))


def warp_bilinear_matmul(other, x2, y2, *, compute_dtype=jnp.bfloat16):
    """Warp ``other [Hs, Ws]`` to ``x2/y2 [...]`` sample positions.

    Returns (values [...], valid [...]) with VectorImage::sample validity
    (x >= 0, y >= 0, x+1 < Ws, y+1 < Hs).
    """
    hs, ws = other.shape
    shape = x2.shape
    xf = x2.reshape(-1)
    yf = y2.reshape(-1)

    kx = lax.broadcasted_iota(jnp.float32, (1, ws), 1)
    trix = _tri(kx - xf[:, None]).astype(compute_dtype)      # [P, Ws]
    # A[p, ky] = other[ky, :] . trix[p, :]
    A = jnp.dot(trix, other.astype(compute_dtype).T,
                preferred_element_type=jnp.float32)          # [P, Hs]

    ky = lax.broadcasted_iota(jnp.float32, (1, hs), 1)
    triy = _tri(ky - yf[:, None])                            # [P, Hs] f32
    out = jnp.sum(A * triy, axis=-1)

    valid = (x2 >= 0) & (y2 >= 0) & (x2 + 1 < ws) & (y2 + 1 < hs)
    out = out.reshape(shape)
    return jnp.where(valid, out, 0.0), valid


def _box(diff):
    """Nearest-neighbour (int-cast floor) kernel: 1 iff 0 <= d < 1 for
    d = x - kx, i.e. kx == floor(x)."""
    return ((diff >= 0.0) & (diff < 1.0)).astype(jnp.float32)


def warp_rows_banded_multi(others, x2, y2, *, band: int = 64,
                           row_block: int = 16,
                           compute_dtype=jnp.bfloat16,
                           sampling: str = "bilinear"):
    """Banded multi-channel warp: processes output rows in blocks, loading
    only a ``band``-row slab of the source around each block's median y2.

    others: [C, Hs, Ws] — all channels share ONE interpolation-matrix
    build and ONE MXU contraction ([P, Ws] @ [Ws, C*band]); the x-triangle
    matrix is the dominant VPU cost of the warp, so channels are near-free
    after the first.  ~Hs/band times cheaper than the full contraction;
    positions farther than the band from the block median are marked
    invalid (epipolar maps are spatially smooth, so a generous band loses
    nothing in practice).

    sampling: "bilinear" (VectorImage::sample semantics — the two-view
    cost, twoviewstereo.cpp:909-977) or "nearest" (VectorImage::pixel
    int-cast semantics — the MVS cost, multiviewstereo.cpp:113-189),
    realized as a box kernel in the same contraction.

    Returns (vals [C, H, W], valid [H, W]).
    """
    c, hs, ws = others.shape
    h, w = x2.shape
    band = min(band, hs)
    while h % row_block:
        row_block //= 2
    n_blocks = h // row_block
    kern = _tri if sampling == "bilinear" else _box

    others_c = others.astype(compute_dtype)
    kx = lax.broadcasted_iota(jnp.float32, (1, ws), 1)
    kb = lax.broadcasted_iota(jnp.float32, (1, band), 1)

    x2b = x2.reshape(n_blocks, row_block * w)
    y2b = y2.reshape(n_blocks, row_block * w)

    def block(xf, yf):
        # dynamic band start from the block's median-ish center; only
        # plausible rows vote — near-plane projections (w ~ 0) produce
        # huge finite coords that would poison the mean and park the
        # band nowhere (their own lookups are OOB-invalid regardless,
        # mirroring the reference's failed pixel()/sample() taps)
        finite = jnp.isfinite(yf) & (yf > -2.0 * hs) & (yf < 3.0 * hs)
        ysum = jnp.sum(jnp.where(finite, yf, 0.0))
        ycnt = jnp.maximum(jnp.sum(finite.astype(jnp.float32)), 1.0)
        ycen = ysum / ycnt
        y0 = jnp.clip(jnp.round(ycen - band / 2).astype(jnp.int32),
                      0, max(hs - band, 0))
        z = jnp.zeros((), y0.dtype)
        slab = lax.dynamic_slice(others_c, (z, y0, z),
                                 (c, band, ws))                # [C, band, Ws]

        trix = kern(xf[:, None] - kx).astype(compute_dtype)     # [P, Ws]
        # With f32 operands the MXU still runs at DEFAULT (bf16) precision
        # unless told otherwise — callers passing compute_dtype=f32 (the
        # MVS nearest-tap path) need exact values: HIGHEST makes the
        # one-hot/triangle selection bit-exact in f32 (measured round 4:
        # default precision bf16-rounds every tap value, flipping MVS
        # peaks at the razor-thin NCC>0.95 cut).
        prec = (lax.Precision.HIGHEST if compute_dtype == jnp.float32
                else lax.Precision.DEFAULT)
        A = jnp.dot(trix, slab.reshape(c * band, ws).T,
                    preferred_element_type=jnp.float32,
                    precision=prec)                             # [P, C*band]
        triy = kern((yf[:, None] - y0.astype(jnp.float32)) - kb)
        out = jnp.sum(A.reshape(-1, c, band) * triy[:, None, :], axis=-1)
        in_band = ((yf >= y0) & (yf + 1 < y0 + band))
        return out, in_band                                    # [P, C], [P]

    out, in_band = jax.vmap(block)(x2b, y2b)
    out = jnp.moveaxis(out.reshape(h, w, c), -1, 0)
    in_band = in_band.reshape(h, w)
    if sampling == "bilinear":
        # VectorImage::sample validity (x >= 0, y >= 0, x+1 < w, y+1 < h)
        valid = ((x2 >= 0) & (y2 >= 0) & (x2 + 1 < ws) & (y2 + 1 < hs)
                 & in_band)
    else:
        # VectorImage::pixel validity (int-cast in bounds)
        valid = (x2 >= 0) & (y2 >= 0) & (x2 < ws) & (y2 < hs) & in_band
    return jnp.where(valid, out, 0.0), valid


def warp_rows_banded(other, x2, y2, *, band: int = 64,
                     row_block: int = 16, compute_dtype=jnp.bfloat16):
    """Single-channel wrapper over :func:`warp_rows_banded_multi`."""
    vals, valid = warp_rows_banded_multi(other[None], x2, y2, band=band,
                                         row_block=row_block,
                                         compute_dtype=compute_dtype)
    return vals[0], valid


def warp_taps_nearest(img, x2, y2, valid_xy, radius: int, *,
                      band: int = 64, row_block: int = 16):
    """OTHER-space integer window taps via multi-channel nearest warp.

    Computes ``tap[r, c](p) = img[int(y2(p)) + r, int(x2(p)) + c]`` for
    all window offsets r, c in [-radius, radius] — the MVS cost's
    ``pixel(img2, x2+col, y2+row)`` lookups (multiviewstereo.cpp:151-158)
    — WITHOUT gathers: for non-negative coords,
    ``int(y2 + r) == int(y2) + r``, so tap (r, c) equals a nearest-warp
    of the (r, c)-shifted image at the base (x2, y2); all S*S shifted
    copies ride ONE interpolation-matrix build and ONE MXU contraction
    (warp_rows_banded_multi channels).

    Returns (taps [S, S, H, W] f32, tap_valid [S, S, H, W] bool).

    Bases OUTSIDE the image still yield their in-bounds taps: the warp
    runs against a radius-padded copy at shifted coords, so any window
    with >= 1 in-bounds tap is served.  The only deviation from the
    reference's per-tap ``(int)`` casts is the one-pixel strip
    x2 (or y2) in (-1, 0), where C truncation-toward-zero clamps to
    pixel 0 but the floor-consistent shift identity lands on -1 (tap
    invalid here).
    """
    size = 2 * radius + 1
    hs, ws = img.shape
    h, w = x2.shape
    x2s = jnp.where(valid_xy, x2 + radius, -1e6)   # padded-image coords
    y2s = jnp.where(valid_xy, y2 + radius, -1e6)

    # channels: ch[a, b] = padimg[a+r, b+c] for the radius-padded image,
    # so nearest-warp of ch at (x2+R, y2+R) = img[floor(y2)+r,
    # floor(x2)+c]
    padimg = jnp.pad(img.astype(jnp.float32), radius)
    pad2 = jnp.pad(padimg, radius)
    hp, wp = padimg.shape
    chans = jnp.stack([
        pad2[radius + r: radius + r + hp, radius + c: radius + c + wp]
        for r in range(-radius, radius + 1)
        for c in range(-radius, radius + 1)])
    vals, base_valid = warp_rows_banded_multi(
        chans, x2s, y2s, band=band, row_block=row_block,
        sampling="nearest", compute_dtype=jnp.float32)
    taps = vals.reshape(size, size, h, w)

    # tap (r, c) valid iff floor(y2)+r / floor(x2)+c is in the ORIGINAL
    # image (these bounds also imply the padded-base bounds) + in-band.
    # Clamp before the int cast: near-plane projections produce ~1e20
    # coords whose f32->s32 conversion is target-defined (a wraparound
    # could validate a garbage tap).
    ix = jnp.floor(jnp.clip(jnp.where(valid_xy, x2, -1e6),
                            -1e6, 1e6)).astype(jnp.int32)
    iy = jnp.floor(jnp.clip(jnp.where(valid_xy, y2, -1e6),
                            -1e6, 1e6)).astype(jnp.int32)
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    ry = iy[None] + offs[:, None, None]          # [S, H, W]
    cx = ix[None] + offs[:, None, None]
    tap_valid = (base_valid[None, None]
                 & ((ry >= 0) & (ry < hs))[:, None]
                 & ((cx >= 0) & (cx < ws))[None, :])
    return taps, tap_valid
