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
                 gray_buf, mask_buf, warp_buf, wv_buf, accs, sems, *,
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

    def depth_body(d, _):
        slot = jax.lax.rem(d, i32(2))
        nxt = jax.lax.rem(d + i32(1), i32(2))

        @pl.when(d + 1 < n_depths)
        def _():
            warp_dma(nxt, d + i32(1)).start()
            wv_dma(nxt, d + i32(1)).start()

        warp_dma(slot, d).wait()
        wv_dma(slot, d).wait()

        # accumulate into VMEM scratch (in-place) so Mosaic's stack
        # allocator reuses buffers instead of materializing 121 taps of
        # SSA temporaries (which OOMs scoped vmem)
        accs[:] = jnp.zeros_like(accs)
        for s in range(size):
            for t in range(size):
                wgt = weights_ref[s * size + t]
                gl = gray_buf[s:s + tile_h, t:t + width]
                lv = mask_buf[s:s + tile_h, t:t + width]
                gr = warp_buf[slot, s:s + tile_h, t:t + width]
                rv = wv_buf[slot, s:s + tile_h, t:t + width]

                m = lv * rv * jnp.where(wgt > _WEPS, 1.0, 0.0)
                wl = wgt * gl
                wr = wgt * gr
                accs[0] += m * wgt
                accs[1] += m * wl
                accs[2] += m * wr
                accs[3] += m * wl * wl
                accs[4] += m * wr * wr
                accs[5] += m * wl * wr
                accs[6] += m

        S_w = accs[0]
        S_l = accs[1]
        S_r = accs[2]
        S_ll = accs[3]
        S_rr = accs[4]
        S_lr = accs[5]
        N = accs[6]

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
        center_valid = wv_buf[slot, radius:radius + tile_h,
                              radius:radius + width] > 0.5
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
    n_depths, h, w = warped_vol.shape
    size = 2 * radius + 1
    while h % tile_h:
        tile_h //= 2
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
        return _call(kernel, out_shape, n_tiles, n_depths, size, tile_h,
                     th, wh, w, f32, depths_f, warped_p, wvalid_p, gray_p,
                     mask_p, weights_f, interpret)


def _call(kernel, out_shape, n_tiles, n_depths, size, tile_h, th, wh, w,
          f32, depths_f, warped_p, wvalid_p, gray_p, mask_p, weights_f,
          interpret=False):
    min_c, second, best = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_tiles,),
        interpret=(pltpu.InterpretParams() if interpret else False),
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
            pltpu.VMEM((7, tile_h, w), f32),  # NCC accumulators
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )(depths_f, warped_p, wvalid_p, gray_p, mask_p, weights_f)
    return min_c, second, best
