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


def warp_rows_banded_multi(others, x2, y2, *, band: int = 64,
                           row_block: int = 16,
                           compute_dtype=jnp.bfloat16):
    """Banded multi-channel warp: processes output rows in blocks, loading
    only a ``band``-row slab of the source around each block's median y2.

    others: [C, Hs, Ws] — all channels share ONE interpolation-matrix
    build and ONE MXU contraction ([P, Ws] @ [Ws, C*band]); the x-triangle
    matrix is the dominant VPU cost of the warp, so channels are near-free
    after the first.  ~Hs/band times cheaper than the full contraction;
    positions farther than the band from the block median are marked
    invalid (epipolar maps are spatially smooth, so a generous band loses
    nothing in practice).

    Returns (vals [C, H, W], valid [H, W]).
    """
    c, hs, ws = others.shape
    h, w = x2.shape
    band = min(band, hs)
    while h % row_block:
        row_block //= 2
    n_blocks = h // row_block

    others_c = others.astype(compute_dtype)
    kx = lax.broadcasted_iota(jnp.float32, (1, ws), 1)
    kb = lax.broadcasted_iota(jnp.float32, (1, band), 1)

    x2b = x2.reshape(n_blocks, row_block * w)
    y2b = y2.reshape(n_blocks, row_block * w)

    def block(xf, yf):
        # dynamic band start from the block's median-ish center
        finite = jnp.isfinite(yf)
        ysum = jnp.sum(jnp.where(finite, yf, 0.0))
        ycnt = jnp.maximum(jnp.sum(finite.astype(jnp.float32)), 1.0)
        ycen = ysum / ycnt
        y0 = jnp.clip(jnp.round(ycen - band / 2).astype(jnp.int32),
                      0, max(hs - band, 0))
        z = jnp.zeros((), y0.dtype)
        slab = lax.dynamic_slice(others_c, (z, y0, z),
                                 (c, band, ws))                # [C, band, Ws]

        trix = _tri(kx - xf[:, None]).astype(compute_dtype)     # [P, Ws]
        A = jnp.dot(trix, slab.reshape(c * band, ws).T,
                    preferred_element_type=jnp.float32)         # [P, C*band]
        triy = _tri(kb - (yf[:, None] - y0.astype(jnp.float32)))
        out = jnp.sum(A.reshape(-1, c, band) * triy[:, None, :], axis=-1)
        in_band = ((yf >= y0) & (yf + 1 < y0 + band))
        return out, in_band                                    # [P, C], [P]

    out, in_band = jax.vmap(block)(x2b, y2b)
    out = jnp.moveaxis(out.reshape(h, w, c), -1, 0)
    in_band = in_band.reshape(h, w)
    valid = (x2 >= 0) & (y2 >= 0) & (x2 + 1 < ws) & (y2 + 1 < hs) & in_band
    return jnp.where(valid, out, 0.0), valid


def warp_rows_banded(other, x2, y2, *, band: int = 64,
                     row_block: int = 16, compute_dtype=jnp.bfloat16):
    """Single-channel wrapper over :func:`warp_rows_banded_multi`."""
    vals, valid = warp_rows_banded_multi(other[None], x2, y2, band=band,
                                         row_block=row_block,
                                         compute_dtype=compute_dtype)
    return vals[0], valid
