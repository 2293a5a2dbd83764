"""Pallas TPU kernel: fused weighted-NCC cost volume + WTA over all depths.

The XLA fast path re-reads the [121, H, W] support weights and reference
windows from HBM for every depth plane (~10 GB over a 100-depth sweep).
This kernel tiles the pixel grid over rows, keeps each tile's weights and
reference windows resident in VMEM, and streams one warped-plane slice per
depth from HBM with double-buffered DMA — the WTA carry (min cost, second
best, best depth with the reference's sequential semantics,
twoviewstereo.cpp:320-326) lives in VMEM.

Inputs are pre-padded by the window radius in both spatial axes so all 121
taps are static slices; the haloed (overlapping) row tiles are DMA'd
manually since BlockSpec windows cannot overlap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WEPS = 1e-10


def _cost_kernel(depths_ref, warped_hbm, wvalid_hbm, grayp_hbm, maskp_hbm,
                 weights_ref, min_ref, second_ref, best_ref,
                 gray_buf, mask_buf, warp_buf, wv_buf, glt_buf, lvt_buf,
                 sems, *,
                 radius: int, n_depths: int, max_color_diff: float,
                 bad_ret: float, tile_h: int, width: int):
    size = 2 * radius + 1
    th = -(-(tile_h + 2 * radius) // 8) * 8     # DMA sublane alignment
    i32 = jnp.int32
    i = jax.lax.convert_element_type(pl.program_id(0), jnp.int32)
    row0 = i * i32(tile_h)

    # static per-tile loads: padded reference gray + combined left validity
    g_dma = pltpu.make_async_copy(
        grayp_hbm.at[pl.ds(row0, th), :], gray_buf, sems.at[i32(2)])
    m_dma = pltpu.make_async_copy(
        maskp_hbm.at[pl.ds(row0, th), :], mask_buf, sems.at[i32(3)])
    g_dma.start()
    m_dma.start()

    min_ref[:] = jnp.full((tile_h, width), jnp.inf, jnp.float32)
    second_ref[:] = jnp.full((tile_h, width), jnp.inf, jnp.float32)
    best_ref[:] = jnp.full((tile_h, width), jnp.nan, jnp.float32)

    def warp_dma(slot, d):
        return pltpu.make_async_copy(
            warped_hbm.at[d, pl.ds(row0, th), :], warp_buf.at[slot],
            sems.at[slot])

    def wv_dma(slot, d):
        return pltpu.make_async_copy(
            wvalid_hbm.at[d, pl.ds(row0, th), :], wv_buf.at[slot],
            sems.at[i32(4) + slot])

    warp_dma(i32(0), i32(0)).start()
    wv_dma(i32(0), i32(0)).start()
    g_dma.wait()
    m_dma.wait()

    # Lane-offset tap slices are expensive on TPU (every misaligned read
    # costs lane shifts).  Hoist them: build the `size` lane-rolled copies
    # of the reference tile ONCE (they are depth-invariant), and roll the
    # warped tile once per (depth, t) — 2*size rolls per depth instead of
    # 4*size^2 misaligned slices.  All remaining tap reads are
    # lane-aligned with sublane offsets only.
    def lane_roll(x, t):
        # left-roll by t (pltpu.roll only takes non-negative shifts)
        return x if t == 0 else pltpu.roll(x, x.shape[1] - t, 1)

    for t in range(size):
        glt_buf[t] = lane_roll(gray_buf[:], t)
        lvt_buf[t] = lane_roll(mask_buf[:], t)

    def depth_body(d, _):
        slot = jax.lax.rem(d, i32(2))
        nxt = jax.lax.rem(d + i32(1), i32(2))

        @pl.when(d + 1 < n_depths)
        def _():
            warp_dma(nxt, d + i32(1)).start()
            wv_dma(nxt, d + i32(1)).start()

        warp_dma(slot, d).wait()
        wv_dma(slot, d).wait()
        w_full = warp_buf[slot]
        v_full = wv_buf[slot]

        # Roll the warped tile once per t (hoisted out of the tap loop).
        wrt = [lane_roll(w_full, t) for t in range(size)]
        rvt = [lane_roll(v_full, t) for t in range(size)]

        # Accumulate in SSA values (register-allocated by Mosaic) — a
        # per-tap VMEM scratch round-trip costs 2 x 7 x [tile, W] of VMEM
        # traffic per tap.  Loop order (s outer, t inner) matches
        # ncc_fast.fast_cost_plane so the f32 summation order — and hence
        # near-tie WTA picks — is bit-identical to the fast path.
        zero = jnp.zeros((tile_h, width), jnp.float32)
        S_w = S_l = S_r = S_ll = S_rr = S_lr = N = zero
        for s in range(size):
            for t in range(size):
                wgt = weights_ref[s * size + t]
                gl = glt_buf[t, s:s + tile_h, :width]
                lv = lvt_buf[t, s:s + tile_h, :width]
                gr = wrt[t][s:s + tile_h, :width]
                rv = rvt[t][s:s + tile_h, :width]

                m = lv * rv * jnp.where(wgt > _WEPS, 1.0, 0.0)
                wl = wgt * gl
                wr = wgt * gr
                mwl = m * wl
                mwr = m * wr
                S_w = S_w + m * wgt
                S_l = S_l + mwl
                S_r = S_r + mwr
                S_ll = S_ll + mwl * wl
                S_rr = S_rr + mwr * wr
                S_lr = S_lr + mwl * wr
                N = N + m

        have = S_w > _WEPS
        S_w_safe = jnp.where(have, S_w, 1.0)
        meanL = S_l / S_w_safe
        meanR = S_r / S_w_safe
        sum1 = S_lr - meanL * S_r - meanR * S_l + N * meanL * meanR
        sum2 = S_ll - 2 * meanL * S_l + N * meanL * meanL
        sum3 = S_rr - 2 * meanR * S_r + N * meanR * meanR

        v = 255.0 * (1.0 - jnp.abs(sum1) / jnp.sqrt(sum2 * sum3))
        v = jnp.where(jnp.isnan(v), max_color_diff,
                      jnp.minimum(max_color_diff, v))
        cost = jnp.where(have, v, bad_ret)
        center_valid = lane_roll(v_full, radius)[
            radius:radius + tile_h, :width] > 0.5
        cost = jnp.where(center_valid, cost, jnp.inf)

        better = cost + 1e-10 < min_ref[:]
        second_ref[:] = jnp.where(better, min_ref[:], second_ref[:])
        min_ref[:] = jnp.where(better, cost, min_ref[:])
        best_ref[:] = jnp.where(better, depths_ref[0, d], best_ref[:])
        return ()

    # i32 bounds keep the induction variable out of i64 (x64 mode is on
    # globally; Mosaic's i64 handling recurses on conversions).
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_depths), depth_body, ())


@functools.partial(
    jax.jit,
    static_argnames=("radius", "tile_h", "max_color_diff", "bad_ret",
                     "interpret"))
def pallas_cost_wta(depths, warped_vol, wvalid_vol, gray_ref, left_valid,
                    weights, *, radius: int, tile_h: int = 32,
                    max_color_diff: float = 120.0, bad_ret: float = 1000.0,
                    interpret: bool = False):
    """Fused cost + WTA over the full depth sweep.

    depths [D]; warped_vol/wvalid_vol [D, H, W]; gray_ref [H, W];
    left_valid [H, W] (combined mask & sample validity for left taps);
    weights [S, S, H, W].  Returns (min_cost, second, best_depth) [H, W].

    interpret: run under the TPU interpret mode (DMA-emulating) so the
    kernel is testable on the CPU backend.
    """
    n_depths, h_in, w = warped_vol.shape
    size = 2 * radius + 1
    # Pad rows up to a tile multiple instead of shrinking the tile: a
    # 60-row block (rowshard at 8 devices) would otherwise fall to
    # tile_h=4 and re-read its 2*radius halo rows 3.5x over.  Pad rows
    # carry zero validity, so they cost bad_ret and are sliced off.
    h = -(-h_in // tile_h) * tile_h
    if h != h_in:
        pad = ((0, 0), (0, h - h_in), (0, 0))
        warped_vol = jnp.pad(warped_vol, pad)
        wvalid_vol = jnp.pad(wvalid_vol, pad)
        gray_ref = jnp.pad(gray_ref, pad[1:])
        left_valid = jnp.pad(left_valid, pad[1:])
        weights = jnp.pad(weights, ((0, 0), (0, 0)) + pad[1:])
    n_tiles = h // tile_h

    f32 = jnp.float32
    # aligned padding: 8-row DMA tiles + 128-lane rows, with enough bottom
    # rows that every tile's aligned DMA window stays in bounds
    th_a = -(-(tile_h + 2 * radius) // 8) * 8
    wh_a = -(-(w + 2 * radius) // 128) * 128
    h_a = (h // tile_h - 1) * tile_h + th_a
    pad3 = ((0, 0), (radius, h_a - h - radius), (radius, wh_a - w - radius))
    pad2 = ((radius, h_a - h - radius), (radius, wh_a - w - radius))
    warped_p = jnp.pad(warped_vol.astype(f32), pad3)
    wvalid_p = jnp.pad(wvalid_vol.astype(f32), pad3)
    gray_p = jnp.pad(gray_ref.astype(f32), pad2)
    mask_p = jnp.pad(left_valid.astype(f32), pad2)
    weights_f = weights.astype(f32).reshape(size * size, h, w)
    depths_f = depths.astype(f32).reshape(1, -1)  # SMEM wants 2D

    kernel = functools.partial(
        _cost_kernel, radius=radius, n_depths=n_depths,
        max_color_diff=max_color_diff, bad_ret=bad_ret,
        tile_h=tile_h, width=w)

    th = -(-(tile_h + 2 * radius) // 8) * 8     # 8-row DMA alignment
    wh = -(-(w + 2 * radius) // 128) * 128      # 128-lane DMA alignment
    out_shape = [jax.ShapeDtypeStruct((h, w), f32)] * 3
    # The package enables x64 globally (calibration needs f64); Mosaic
    # rejects 64-bit values, so the kernel traces under disable_x64.
    with jax.enable_x64(False):
        min_c, second, best = _call(
            kernel, out_shape, n_tiles, n_depths, size, tile_h,
            th, wh, w, f32, depths_f, warped_p, wvalid_p, gray_p,
            mask_p, weights_f, interpret)
    return min_c[:h_in], second[:h_in], best[:h_in]


def _call(kernel, out_shape, n_tiles, n_depths, size, tile_h, th, wh, w,
          f32, depths_f, warped_p, wvalid_p, gray_p, mask_p, weights_f,
          interpret=False):
    min_c, second, best = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_tiles,),
        interpret=(pltpu.InterpretParams(dma_execution_mode="eager")
                   if interpret else False),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # depths (full)
            pl.BlockSpec(memory_space=pl.ANY),           # warped (HBM)
            pl.BlockSpec(memory_space=pl.ANY),           # wvalid (HBM)
            pl.BlockSpec(memory_space=pl.ANY),           # gray_p (HBM)
            pl.BlockSpec(memory_space=pl.ANY),           # mask_p (HBM)
            pl.BlockSpec((size * size, tile_h, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),       # weights tile
        ],
        out_specs=[
            pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)] * 3,
        scratch_shapes=[
            pltpu.VMEM((th, wh), f32),        # gray_buf
            pltpu.VMEM((th, wh), f32),        # mask_buf
            pltpu.VMEM((2, th, wh), f32),     # warp_buf
            pltpu.VMEM((2, th, wh), f32),     # wv_buf
            pltpu.VMEM((size, th, wh), f32),  # glt_buf (lane-rolled gray)
            pltpu.VMEM((size, th, wh), f32),  # lvt_buf (lane-rolled valid)
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )(depths_f, warped_p, wvalid_p, gray_p, mask_p, weights_f)
    return min_c, second, best
