"""Pallas TPU kernel: exact nearest-neighbour map sampling.

XLA:TPU lowers scattered ``img[iy, ix]`` reads to a serial gather
(~20 ms per 1.4M taps measured on the MVS cross-check, round-5 device
profile).  This kernel implements the same read with the patch-DMA +
one-hot-matmul selection machinery of ops/pallas_mvs.py — ~5x cheaper
WHEN the coordinates are per-tile coherent:

* per (source, tile) a patch of the source map is DMA'd (bbox of the
  tile's contained coordinates, precomputed in XLA; 8/128-aligned);
* values ride as an EXACT 3-way bf16 split (hi, mid, lo: 3 x 8 mantissa
  bits >= f32's 24), plus a finiteness channel — NaN/inf sentinel
  pixels cannot ride a matmul (NaN * 0 = NaN), so the wrapper
  sanitizes the source and returns the finite mask separately; the
  reconstructed f32 values are BIT-IDENTICAL to the XLA gather;
* selection: clamped-trunc column one-hot on the MXU (all 4 channels
  share one matmul), then a clamped-trunc row one-hot sublane reduce —
  the exact ``clip(trunc(c), 0, n-1)`` semantics of
  stereo/multiview.mvs_cross_check_oneview (multiviewstereo.cpp:698).

Rows outside the DMA'd band return finite=False and are counted
(``oob_frac``).

APPLICABILITY (measured, round 5): the MVS cross-check was the target,
but its coordinates scatter with each pixel's DEPTH — per-tile x-spans
reach ~340 px and wide-baseline pairs exceed any fixed y-band, so the
bounded-patch form dropped 8-40% of real cross-check confirmations and
the engine keeps the exact XLA gather instead
(stereo/multiview.mvs_cross_check_oneview).  Use this op where the
coordinate field is smooth per tile (e.g. warps of a single depth
plane); the bit-exactness contract is tested in
tests/test_pallas_mvs.py::test_sample_nearest_bit_exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sample_kernel(coords_hbm, offs_hbm, src_hbm, out_v, out_f,
                   offs_smem, coord_buf, patch_buf, stage, sems,
                   *, py: int, px: int, p_lanes: int, hs: int, ws: int,
                   n_tiles: int):
    i32 = jnp.int32
    f32 = jnp.float32
    u = jax.lax.convert_element_type(pl.program_id(0), i32)
    j = u // i32(n_tiles)                 # source map index
    i = u % i32(n_tiles)                  # tile index

    o_dma = pltpu.make_async_copy(offs_hbm.at[u], offs_smem,
                                  sems.at[i32(2)])
    o_dma.start()
    c_dma = pltpu.make_async_copy(coords_hbm.at[u], coord_buf,
                                  sems.at[i32(3)])
    c_dma.start()
    o_dma.wait()
    y0r = offs_smem[0, 0]
    alive = y0r >= 0
    y0 = jnp.maximum(y0r, i32(0))
    x0 = jnp.maximum(offs_smem[0, 1], i32(0))

    @pl.when(alive)
    def _():
        pltpu.make_async_copy(
            src_hbm.at[j, :, pl.ds(pl.multiple_of(y0, 8), py),
                       pl.ds(pl.multiple_of(x0, 128), px)],
            patch_buf, sems.at[i32(0)]).start()
    c_dma.wait()

    @pl.when(alive)
    def _():
        pltpu.make_async_copy(
            src_hbm.at[j, :, pl.ds(i32(0), py), pl.ds(i32(0), px)],
            patch_buf, sems.at[i32(0)]).wait()
        x2 = coord_buf[0:1, :]
        y2 = coord_buf[1:2, :]
        # clip(trunc(c), 0, n-1) — the reference's int-cast + clamp
        xc = jnp.clip(x2, -1e6, 1e6)
        yc = jnp.clip(y2, -1e6, 1e6)
        ix = jnp.clip(jax.lax.convert_element_type(jnp.trunc(xc), i32),
                      0, ws - 1) - x0
        iy = jnp.clip(jax.lax.convert_element_type(jnp.trunc(yc), i32),
                      0, hs - 1) - y0

        iota_px = jax.lax.broadcasted_iota(i32, (px, p_lanes), 0)
        iota_py = jax.lax.broadcasted_iota(i32, (py, p_lanes), 0)
        B = (iota_px
             == jnp.broadcast_to(ix, (px, p_lanes))).astype(f32)
        B = B.astype(jnp.bfloat16)
        stacked = patch_buf[...].reshape(4 * py, px)
        A = jnp.dot(stacked, B, preferred_element_type=f32)

        rs = iota_py == jnp.broadcast_to(iy, (py, p_lanes))
        in_band = ((iy >= 0) & (iy < py)
                   & (ix >= 0) & (ix < px))

        def row(ch):
            blk = A[ch * py:(ch + 1) * py]
            return jnp.sum(jnp.where(rs, blk, 0.0), axis=0,
                           keepdims=True)

        # exact f32 reconstruction: hi + mid + lo (3 x 8 mantissa bits)
        val = row(0) + row(1) + row(2)
        fin = row(3)
        stage[0] = jnp.where(in_band, val, 0.0)
        # finite=1; band-missed an IN-MAP coordinate=-1 (the only real
        # coverage loss, counted by the wrapper); else 0 (NaN source or
        # out-of-map — the consumer's `contains` masks the latter)
        map_ok = (x2 >= 0) & (y2 >= 0) & (x2 < ws) & (y2 < hs)
        stage[1] = jnp.where(in_band & (fin > 0.5), 1.0,
                             jnp.where(map_ok & ~in_band, -1.0, 0.0))

    @pl.when(~alive)
    def _():
        stage[0] = jnp.zeros((1, p_lanes), f32)
        stage[1] = jnp.zeros((1, p_lanes), f32)

    for idx, ref in ((0, out_v), (1, out_f)):
        dma = pltpu.make_async_copy(stage.at[idx], ref.at[u],
                                    sems.at[i32(1)])
        dma.start()
        dma.wait()


@functools.partial(
    jax.jit,
    static_argnames=("tile_h", "tile_w", "patch_h", "patch_w",
                     "interpret"))
def pallas_sample_nearest(srcs, x2, y2, *, tile_h: int = 8,
                          tile_w: int = 32, patch_h: int = 48,
                          patch_w=None,
                          interpret: bool = False):
    """Sample ``srcs[j]`` at clamped-trunc integer coords, exactly.

    srcs [V, hs, ws] f32 (NaN/inf allowed — returned via the finite
    mask); x2/y2 [V, H, W] f32 coordinates in srcs' pixel frame (may be
    garbage where the caller's validity is false — values are clamped
    into the map like the reference's lookups).

    Returns (vals [V, H, W] f32, finite [V, H, W] bool, oob_frac):
    vals bit-equal to ``where(isfinite(g), g, 0)`` for
    ``g = srcs[j][clip(trunc(y2), 0, hs-1), clip(trunc(x2), 0, ws-1)]``,
    finite False where g was NaN/inf OR the tile's row band missed the
    coordinate (oob, counted).
    """
    from .pallas_mvs import _tile_layout, _untile

    f32 = jnp.float32
    n_src, hs, ws = srcs.shape
    v, h, w = x2.shape
    assert v == n_src
    hp = -(-h // tile_h) * tile_h
    wp = -(-w // tile_w) * tile_w
    pad_hw = ((0, 0), (0, hp - h), (0, wp - w))
    x2 = jnp.pad(x2.astype(f32), pad_hw, constant_values=-1.0)
    y2 = jnp.pad(y2.astype(f32), pad_hw, constant_values=-1.0)
    p_lanes = tile_h * tile_w
    n_tiles = (hp // tile_h) * (wp // tile_w)

    fin = jnp.isfinite(srcs)
    clean = jnp.where(fin, srcs, 0.0).astype(f32)
    hi = clean.astype(jnp.bfloat16)
    r1 = clean - hi.astype(f32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(f32)).astype(jnp.bfloat16)
    src4 = jnp.stack([hi, mid, lo, fin.astype(jnp.bfloat16)],
                     axis=1)                       # [V, 4, hs, ws]
    hs_p = max(-(-hs // 8) * 8, patch_h)
    # patch_w=None -> full image width: the MVS cross-check's epipolar
    # direction is near-horizontal on this rig (measured per-tile
    # x-spans up to ~340 px vs y-spans <= 27), so x-bboxing loses real
    # checks while the y-band stays tight
    ws_p = -(-ws // 128) * 128
    if patch_w is None:
        patch_w = ws_p
    ws_p = max(ws_p, patch_w)
    src4 = jnp.pad(src4, ((0, 0), (0, 0), (0, hs_p - hs),
                          (0, ws_p - ws)))

    xt = _tile_layout(x2, tile_h, tile_w)          # [V, T, P]
    yt = _tile_layout(y2, tile_h, tile_w)
    coords = jnp.stack([xt, yt], axis=2)           # [V, T, 2, P]
    coords = coords.reshape(v * n_tiles, 2, p_lanes)

    # patch offsets from the coordinates that actually land in the map
    rel = (xt > -1.0) & (xt < ws) & (yt > -1.0) & (yt < hs)
    big = jnp.asarray(3e6, f32)
    ymin = jnp.min(jnp.where(rel, yt, big), axis=-1)     # [V, T]
    xmin = jnp.min(jnp.where(rel, xt, big), axis=-1)
    alive = jnp.any(rel, axis=-1)
    y0 = jnp.clip((jnp.floor(ymin).astype(jnp.int32)) // 8 * 8,
                  0, hs_p - patch_h)
    x0 = jnp.clip((jnp.floor(xmin).astype(jnp.int32)) // 128 * 128,
                  0, ws_p - patch_w)
    y0 = jnp.where(alive, y0, -1)
    offs = jnp.stack([y0, x0], axis=-1).reshape(v * n_tiles, 1, 2)
    offs = jnp.pad(offs, ((0, 0), (0, 0), (0, 126)))

    kernel = functools.partial(
        _sample_kernel, py=patch_h, px=patch_w, p_lanes=p_lanes,
        hs=hs, ws=ws, n_tiles=n_tiles)
    out_shape = [jax.ShapeDtypeStruct((v * n_tiles, 1, p_lanes), f32)
                 ] * 2
    with jax.enable_x64(False):
        vals_t, fin_t = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(v * n_tiles,),
            interpret=(pltpu.InterpretParams(dma_execution_mode="eager")
                       if interpret else False),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            scratch_shapes=[
                pltpu.SMEM((1, 128), jnp.int32),
                pltpu.VMEM((2, p_lanes), f32),
                pltpu.VMEM((4, patch_h, patch_w), jnp.bfloat16),
                pltpu.VMEM((2, 1, p_lanes), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        )(coords, offs, src4)

    vals = _untile(vals_t.reshape(v, n_tiles, p_lanes), hp, wp,
                   tile_h, tile_w)[:, :h, :w]
    fmap = _untile(fin_t.reshape(v, n_tiles, p_lanes), hp, wp,
                   tile_h, tile_w)[:, :h, :w]
    oob = jnp.sum(fmap < -0.5) / float(v * h * w)
    return vals, fmap > 0.5, oob
