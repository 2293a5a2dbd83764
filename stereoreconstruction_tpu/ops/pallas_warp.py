"""Pallas TPU kernel: bilinear epipolar warp of the other view.

Replaces the XLA banded-warp volume build (ops/warp.warp_rows_banded_multi
driven per depth by stereo/twoview.py) that the round-5 device profile
measured at ~43 ms/view — 60% of the whole two-view pipeline: per depth
XLA expands a [pixels, 128]-wide interpolation band (fusion of ~25M f32
elements), reduces it, and round-trips the plane through HBM.

This kernel re-designs the warp around the patch-DMA machinery of
ops/pallas_mvs.py:

* the reference grid is cut into 8 x 32 tiles (256 lanes); per
  (tile, depth) the match coordinates land in a compact patch of the
  other image whose bbox offsets are precomputed in XLA;
* the patch (gray + mask*255, both bf16) is DMA'd from HBM; the x-side
  bilinear lerp is ONE MXU matmul against a two-hot triangle matrix
  ``B[px, P]`` carrying bf16(1-fx)/bf16(fx) — gray and mask share the
  matmul via channel stacking; the y-side lerp is two one-hot sublane
  selects combined with f32 weights;
* per-depth arithmetic REPLICATES ops/warp.py bit-for-bit where both
  are valid: bf16 source values x bf16 triangle weights accumulated in
  f32 on the MXU (2 nonzero products -> exact, order-independent), then
  the y-lerp in f32 — so WTA picks match the XLA fast path except where
  the band heuristic itself failed (positions farther than band/2 from
  the block median, which the bbox patch covers);
* dead units — tiles with no support-window-relevant pixel (dilated
  mask) or no in-image coordinate at a depth — skip their DMAs and
  compute entirely (~half the bunny sweep).

Outputs land as [D, H, W] (warped, valid) volumes, the exact input
contract of ops/pallas_ncc.pallas_cost_wta.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SENTINEL = -1e6


def _warp_kernel(coords_hbm, offs_hbm, patches_hbm, out_w, out_v,
                 offs_smem, coord_buf, patch_buf, warp_acc, valid_acc,
                 sems, *, n_depths: int, py: int, px: int, p_lanes: int,
                 hs: int, ws: int):
    i32 = jnp.int32
    f32 = jnp.float32
    i = jax.lax.convert_element_type(pl.program_id(0), i32)

    o_dma = pltpu.make_async_copy(offs_hbm.at[i], offs_smem,
                                  sems.at[i32(4)])
    o_dma.start()
    # the whole tile's coordinate sweep in one DMA: [D, 2, P]
    c_dma = pltpu.make_async_copy(coords_hbm.at[i], coord_buf,
                                  sems.at[i32(5)])
    c_dma.start()
    o_dma.wait()

    def off_at(d, j):
        return offs_smem[0, d * i32(2) + j]

    def patch_dma(slot, d):
        y0 = jnp.maximum(off_at(d, i32(0)), i32(0))
        x0 = jnp.maximum(off_at(d, i32(1)), i32(0))
        return pltpu.make_async_copy(
            patches_hbm.at[:, pl.ds(pl.multiple_of(y0, 8), py),
                           pl.ds(pl.multiple_of(x0, 128), px)],
            patch_buf.at[slot], sems.at[slot])

    @pl.when(off_at(i32(0), i32(0)) >= 0)
    def _():
        patch_dma(i32(0), i32(0)).start()
    c_dma.wait()

    iota_py = jax.lax.broadcasted_iota(i32, (py, p_lanes), 0)
    iota_px = jax.lax.broadcasted_iota(i32, (px, p_lanes), 0)

    def step(d, carry):
        slot = jax.lax.rem(d, i32(2))
        nxt = jax.lax.rem(d + i32(1), i32(2))

        @pl.when((d + 1 < n_depths) & (off_at(d + i32(1), i32(0)) >= 0))
        def _():
            patch_dma(nxt, d + i32(1)).start()

        y0r = off_at(d, i32(0))
        alive = y0r >= 0

        @pl.when(alive)
        def _():
            patch_dma(slot, d).wait()
            x0 = jnp.maximum(off_at(d, i32(1)), i32(0))
            y0 = jnp.maximum(y0r, i32(0))
            x2 = coord_buf[d, 0:1, :]                  # [1, P]
            y2 = coord_buf[d, 1:2, :]

            base_ok = x2 > _SENTINEL
            xc = jnp.clip(x2, -1e6, 1e6)
            yc = jnp.clip(y2, -1e6, 1e6)
            ixf = jnp.floor(xc)
            iyf = jnp.floor(yc)
            fx = xc - ixf                              # f32
            fy = yc - iyf
            ix = jax.lax.convert_element_type(ixf, i32) - x0
            iy = jax.lax.convert_element_type(iyf, i32) - y0

            # two-hot triangle matrix: bf16(1-fx) at ix, bf16(fx) at
            # ix+1 — exactly the bf16-cast weights of ops/warp.py's
            # trix rows at the two nonzero columns.  Built in f32 then
            # cast (a bf16 where() hits a Mosaic i1-relayout bug); the
            # cast of sel*w equals the cast of w at the hot entries.
            sel0 = (iota_px
                    == jnp.broadcast_to(ix, (px, p_lanes))).astype(f32)
            sel1 = (iota_px
                    == jnp.broadcast_to(ix + 1,
                                        (px, p_lanes))).astype(f32)
            B = (sel0 * (1.0 - fx)
                 + sel1 * fx).astype(jnp.bfloat16)
            # gray and mask channels share one MXU contraction
            stacked = patch_buf[slot].reshape(2 * py, px)
            A = jnp.dot(stacked, B, preferred_element_type=f32)
            A_g = A[:py]
            A_m = A[py:]

            rs0 = iota_py == jnp.broadcast_to(iy, (py, p_lanes))
            rs1 = iota_py == jnp.broadcast_to(iy + 1, (py, p_lanes))
            g0 = jnp.sum(jnp.where(rs0, A_g, 0.0), axis=0, keepdims=True)
            g1 = jnp.sum(jnp.where(rs1, A_g, 0.0), axis=0, keepdims=True)
            m0 = jnp.sum(jnp.where(rs0, A_m, 0.0), axis=0, keepdims=True)
            m1 = jnp.sum(jnp.where(rs1, A_m, 0.0), axis=0, keepdims=True)
            # y-lerp in f32 (ops/warp.py keeps triy in f32): the two
            # products round once each then one add — same as the XLA
            # band reduce over a two-nonzero row
            wy0 = 1.0 - fy
            gval = g0 * wy0 + g1 * fy
            mval = m0 * wy0 + m1 * fy

            # VectorImage::sample validity + patch coverage
            samp_ok = ((x2 >= 0) & (y2 >= 0) & (x2 + 1 < ws)
                       & (y2 + 1 < hs))
            in_patch = ((ix >= 0) & (ix + 1 < px)
                        & (iy >= 0) & (iy + 1 < py))
            valid = base_ok & samp_ok & in_patch & (mval > 254.0)
            warp_acc[pl.ds(d, 1)] = jnp.where(valid, gval, 0.0)
            # in-image but outside the DMA'd patch -> coverage loss,
            # encoded as -1 (consumers treat any <=0 as invalid and the
            # wrapper reports the fraction)
            valid_acc[pl.ds(d, 1)] = jnp.where(
                valid, 1.0, jnp.where(base_ok & samp_ok & ~in_patch,
                                      -1.0, 0.0))

        @pl.when(~alive)
        def _():
            warp_acc[pl.ds(d, 1)] = jnp.zeros((1, p_lanes), f32)
            valid_acc[pl.ds(d, 1)] = jnp.zeros((1, p_lanes), f32)
        return carry

    n_pad_rows = warp_acc.shape[0] - n_depths
    if n_pad_rows:
        warp_acc[pl.ds(n_depths, n_pad_rows)] = jnp.zeros(
            (n_pad_rows, p_lanes), f32)
        valid_acc[pl.ds(n_depths, n_pad_rows)] = jnp.zeros(
            (n_pad_rows, p_lanes), f32)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_depths), step, 0)

    for idx, (buf, ref) in enumerate(((warp_acc, out_w),
                                      (valid_acc, out_v))):
        dma = pltpu.make_async_copy(buf, ref.at[i], sems.at[i32(6) + idx])
        dma.start()
        dma.wait()


@functools.partial(
    jax.jit,
    static_argnames=("tile_h", "tile_w", "patch_h", "patch_w",
                     "interpret"))
def pallas_warp_bilinear(coords, gray_oth, mask_oth, *, tile_h: int = 8,
                         tile_w: int = 32, patch_h: int = 32,
                         patch_w: int = 256, relevant=None,
                         interpret: bool = False):
    """Bilinear warp volume through patch-DMA tiles.

    coords [D, 2, H, W] f32 — match coordinates in the other view's
    scaled pixel frame, ``-3e6`` where the base sample is invalid (the
    ``jnp.where(mvalid, xy, -3e6)`` convention of stereo/twoview.py);
    gray_oth [hs, ws] f32; mask_oth [hs, ws] bool.

    relevant [H, W] bool (optional): pixels whose warped value is ever
    consumed (e.g. the support-window-dilated mask); tiles/depths with
    no relevant in-image coordinate skip DMA + compute entirely.

    Returns (warped [D, H, W] f32, wvalid [D, H, W] bool, oob_frac):
    same value contract as ops/ncc_fast.warp_other (bit-identical where
    both are valid), plus the fraction of sample-valid positions whose
    taps fell outside the DMA'd patches.
    """
    from .pallas_mvs import _tile_layout, _untile

    n_depths = coords.shape[0]
    h, w = coords.shape[-2:]
    hs, ws = gray_oth.shape
    f32 = jnp.float32
    assert h % tile_h == 0 and w % tile_w == 0, (h, w, tile_h, tile_w)
    p_lanes = tile_h * tile_w
    n_tiles = (h // tile_h) * (w // tile_w)

    g_bf = gray_oth.astype(f32).astype(jnp.bfloat16)
    m_bf = (jnp.asarray(mask_oth, f32) * 255.0).astype(jnp.bfloat16)
    hs_p = max(-(-hs // 8) * 8, patch_h)
    ws_p = max(-(-ws // 128) * 128, patch_w)
    patches = jnp.stack([g_bf, m_bf])                    # [2, hs, ws]
    patches = jnp.pad(patches, ((0, 0), (0, hs_p - hs), (0, ws_p - ws)))

    coords_t = _tile_layout(coords.astype(f32), tile_h,
                            tile_w)                      # [D, 2, T, P]
    coords_k = jnp.moveaxis(coords_t, 2, 0)              # [T, D, 2, P]

    x2 = coords_t[:, 0]                                  # [D, T, P]
    y2 = coords_t[:, 1]
    rel = ((x2 > _SENTINEL) & (x2 > -2.0) & (x2 + 1 < ws)
           & (y2 > -2.0) & (y2 + 1 < hs))
    if relevant is not None:
        rv = _tile_layout(jnp.asarray(relevant, jnp.bool_)[None],
                          tile_h, tile_w)[0]             # [T, P]
        rel = rel & rv[None]
    big = jnp.asarray(3e6, f32)
    ymin = jnp.min(jnp.where(rel, y2, big), axis=-1)     # [D, T]
    xmin = jnp.min(jnp.where(rel, x2, big), axis=-1)
    alive = jnp.any(rel, axis=-1)
    y0 = jnp.clip((jnp.floor(ymin).astype(jnp.int32) - 1) // 8 * 8,
                  0, hs_p - patch_h)
    x0 = jnp.clip((jnp.floor(xmin).astype(jnp.int32) - 1) // 128 * 128,
                  0, ws_p - patch_w)
    y0 = jnp.where(alive, y0, -1)
    offs = jnp.stack([y0, x0], axis=-1)                  # [D, T, 2]
    offs = jnp.moveaxis(offs, 1, 0)                      # [T, D, 2]
    flat = n_depths * 2
    lanes = -(-flat // 128) * 128
    offs_pack = jnp.pad(offs.reshape(n_tiles, 1, flat).astype(jnp.int32),
                        ((0, 0), (0, 0), (0, lanes - flat)))

    kernel = functools.partial(
        _warp_kernel, n_depths=n_depths, py=patch_h, px=patch_w,
        p_lanes=p_lanes, hs=hs, ws=ws)

    # output DMAs slice [1, D, P] out of [T, D, P]: the sublane dim (D)
    # must be 8-aligned, so the accumulators/outputs pad D up
    d_pad = -(-n_depths // 8) * 8
    out_shape = [jax.ShapeDtypeStruct((n_tiles, d_pad, p_lanes), f32)
                 ] * 2
    with jax.enable_x64(False):
        warped_t, valid_t = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(n_tiles,),
            interpret=(pltpu.InterpretParams(dma_execution_mode="eager")
                       if interpret else False),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),       # coords (HBM)
                pl.BlockSpec(memory_space=pl.ANY),       # offs (HBM)
                pl.BlockSpec(memory_space=pl.ANY),       # patches (HBM)
            ],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            scratch_shapes=[
                pltpu.SMEM((1, lanes), jnp.int32),             # offs
                pltpu.VMEM((n_depths, 2, p_lanes), f32),       # coords
                pltpu.VMEM((2, 2, patch_h, patch_w),
                           jnp.bfloat16),                      # patches
                pltpu.VMEM((d_pad, p_lanes), f32),             # warped
                pltpu.VMEM((d_pad, p_lanes), f32),             # valid
                pltpu.SemaphoreType.DMA((8,)),
            ],
        )(coords_k, offs_pack, patches)

    # [T, Dpad, P] -> [D, T, P] -> [D, H, W]
    warped = _untile(jnp.moveaxis(warped_t[:, :n_depths], 1, 0), h, w,
                     tile_h, tile_w)
    valid_f = _untile(jnp.moveaxis(valid_t[:, :n_depths], 1, 0), h, w,
                      tile_h, tile_w)
    oob = jnp.sum(valid_f < -0.5)
    n_samp = jnp.sum(jnp.abs(valid_f) > 0.5)
    oob_frac = oob / jnp.maximum(n_samp, 1)
    return warped, valid_f > 0.5, oob_frac
