"""Pallas TPU kernel: fused MVS other-space-tap NCC + WTA over the sweep.

The XLA fast path realizes the MVS cost's integer-pixel window taps
(``pixel()`` lookups, multiviewstereo.cpp:151-158) as 25 shifted-image
channels through a dense banded interpolation matmul
(ops/warp.warp_taps_nearest): ~99% of those MXU FLOPs multiply zeros,
the 64-row band drops ~27% of valid sample positions on wide-baseline
neighbours (round-4 measurement), and every (label, neighbour) round-
trips a [25, H, W] tap volume through HBM.

This kernel re-designs the tap path around the actual structure:

* the reference grid is cut into small 2D tiles (default 16 x 64 px,
  flattened to the 1024-lane axis) — small enough that the tile's
  epipolar samples at ONE depth label land in a compact 2D patch of the
  neighbour image even under large inter-view rotation;
* per (tile, neighbour, label) the patch ([96, 256] default) is DMA'd
  from HBM with offsets precomputed in XLA from the coordinate volume —
  an oriented 2D band, replacing the row-band whose placement failed;
* taps are selected from the patch without gathers: a one-hot
  column-select matmul ``patch[Py, Px] @ boxT[Px, P]`` on the MXU
  (values ride as an exact bf16 hi+lo split, so f32 tap values are
  reconstructed to ~2^-18 relative), then a per-window-row one-hot
  sublane reduce — no relayouts, every array keeps pixels on lanes;
* the 7-accumulator weighted-NCC epilogue (ops/ncc.ncc_accumulate
  mvs_mode semantics, multiviewstereo.cpp:113-189) and the
  (peak > thr, ties -> larger depth) WTA carry
  (stereo/multiview.mvs_wta_slab) run fused in VMEM; only the final
  (best_ncc, best_depth) planes leave the kernel.

Tap semantics are the reference's EXACT ``(int)`` casts, including the
truncation-toward-zero clamp on the (-1, 0) strip that the warp-based
path documented as a deviation: tap (r, c) reads
``clip(floor(x2) + c, 0, ws-1)`` and is valid iff ``-1 < x2 + c < ws``
(same for rows) — identical to pixel_lookup on x2 + c.

Positions whose taps fall outside the DMA'd patch are masked invalid and
counted; the wrapper reports the fraction (bench gates catch any quality
impact; measured ~0 at the default patch size on the bunny rig).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WEPS = 1e-10
_SENTINEL = -1e6       # base-invalid coordinate marker (wrapper writes -3e6)


def _mvs_kernel(depths_ref, nbrv_ref, coords_hbm, offs_hbm, patches_hbm,
                gl_ref, lv_ref, w_ref, ncc_out, depth_out, oob_out,
                offs_smem, coord_buf, patch_buf, taps_buf, tapv_buf,
                state, topn_buf, topd_buf, sems,
                *, radius: int, n_depths: int, n_nbr: int, thr: float,
                py: int, px: int, p_lanes: int, hs: int, ws: int,
                n_topk: int):
    size = 2 * radius + 1
    i32 = jnp.int32
    f32 = jnp.float32
    i = jax.lax.convert_element_type(pl.program_id(0), i32)

    # per-tile patch offsets -> SMEM (one small DMA, prefetched first;
    # packed flat + lane-padded: HBM slices must be 128-lane aligned)
    o_dma = pltpu.make_async_copy(offs_hbm.at[i], offs_smem, sems.at[i32(4)])
    o_dma.start()

    def off_at(n, d, j):
        return offs_smem[0, (n * i32(n_depths) + d) * i32(2) + j]

    def alive_at(k):
        n = k % i32(n_nbr)
        d = k // i32(n_nbr)
        return off_at(n, d, i32(0)) >= 0

    def coord_dma(slot, d, n):
        # coords layout [T, D, N, 2, P]: the sliced-by-1 dims lead, the
        # full (2, P) trailing pair satisfies Mosaic's tiling rules
        return pltpu.make_async_copy(
            coords_hbm.at[i, d, n], coord_buf.at[slot],
            sems.at[slot])

    def patch_dma(slot, d, n, y0, x0):
        # offsets are built 8/128-aligned in the wrapper; tell Mosaic
        return pltpu.make_async_copy(
            patches_hbm.at[n, :, pl.ds(pl.multiple_of(y0, 8), py),
                           pl.ds(pl.multiple_of(x0, 128), px)],
            patch_buf.at[slot], sems.at[i32(2) + slot])

    o_dma.wait()

    @pl.when(alive_at(i32(0)))
    def _():
        # dead units skip their DMAs too (the per-copy issue overhead
        # across ~60% dead bunny units was a large share of the sweep)
        coord_dma(i32(0), i32(0), 0).start()
        patch_dma(i32(0), i32(0), 0,
                  jnp.maximum(off_at(i32(0), i32(0), i32(0)), i32(0)),
                  jnp.maximum(off_at(i32(0), i32(0), i32(1)),
                              i32(0))).start()

    # sweep state in VMEM scratch (state rows: per-label ncc acc, oob
    # count) so the per-unit compute can sit under pl.when — dead units
    # (y0 = -1: no relevant sample, or an all-masked-center tile) skip
    # the tap matmuls and NCC entirely (~60% of bunny units).  The
    # hypothesis list (topn/topd, ascending by (ncc, depth)) holds the
    # top-K peaks of multiviewstereo.cpp:574-602; n_topk=1 degenerates
    # to the WTA carry (same >= later-depth-wins tie rule).
    state[0] = jnp.full((1, p_lanes), -jnp.inf, f32)
    state[1] = jnp.zeros((1, p_lanes), f32)
    # buffers are K padded to a DMA-aligned multiple of 8 rows; the
    # insertion loop below only ever touches rows [0, n_topk)
    topn_buf[...] = jnp.full(topn_buf.shape, -jnp.inf, f32)
    topd_buf[...] = jnp.full(topd_buf.shape, -1.0, f32)

    # left-side per-tap constants (VMEM blocks, pixels on lanes)
    wgt = w_ref[0]                         # [25, P]
    gl = gl_ref[0]
    lmask = (lv_ref[0] > 0.5) & (wgt > _WEPS)
    wl = wgt * gl

    # integer iota/compares: Mosaic's tpu.iota is integer-only
    iota_py = jax.lax.broadcasted_iota(i32, (py, p_lanes), 0)
    iota_px = jax.lax.broadcasted_iota(i32, (px, p_lanes), 0)

    def step(k, carry):
        d = k // i32(n_nbr)
        n = k % i32(n_nbr)
        slot = jax.lax.rem(k, i32(2))
        nxt = jax.lax.rem(k + i32(1), i32(2))

        @pl.when((k + 1 < n_depths * n_nbr) & alive_at(k + i32(1)))
        def _():
            d1 = (k + i32(1)) // i32(n_nbr)
            n1 = (k + i32(1)) % i32(n_nbr)
            # n is dynamic here; .at[] with a traced leading index is fine
            pltpu.make_async_copy(
                coords_hbm.at[i, d1, n1], coord_buf.at[nxt],
                sems.at[nxt]).start()
            patch_dma(nxt, d1, n1,
                      jnp.maximum(off_at(n1, d1, i32(0)), i32(0)),
                      jnp.maximum(off_at(n1, d1, i32(1)),
                                  i32(0))).start()

        @pl.when(alive_at(k))
        def _():
            coord_dma(slot, d, n).wait()
            pltpu.make_async_copy(
                patches_hbm.at[0, :, pl.ds(i32(0), py),
                               pl.ds(i32(0), px)],
                patch_buf.at[slot], sems.at[i32(2) + slot]).wait()

        y0r = off_at(n, d, i32(0))
        alive = y0r >= 0

        @pl.when(alive)
        def _():
            x2 = coord_buf[slot, 0:1, :]               # [1, P]
            y2 = coord_buf[slot, 1:2, :]
            x0 = jnp.maximum(off_at(n, d, i32(1)), i32(0))
            y0 = jnp.maximum(y0r, i32(0))

            base_ok = x2 > _SENTINEL
            # floor with clip first: garbage coords (1e20) have
            # undefined f32->int casts (ops/warp.py rationale)
            xc = jnp.clip(x2, -1e6, 1e6)
            yc = jnp.clip(y2, -1e6, 1e6)
            ixf = jnp.floor(xc)                        # f32 floor, exact
            iyf = jnp.floor(yc)

            ph = patch_buf[slot, 0]
            plo = patch_buf[slot, 1]
            for c in range(-radius, radius + 1):
                # exact (int)(x2+c) semantics incl. (-1,0)->0 clamp
                jx = jnp.clip(ixf + c, 0.0, float(ws - 1))
                px_idx = jax.lax.convert_element_type(jx, i32) - x0
                boxT = (iota_px
                        == jnp.broadcast_to(px_idx, (px, p_lanes)))
                boxT = boxT.astype(jnp.bfloat16)
                A = (jnp.dot(ph, boxT, preferred_element_type=f32)
                     + jnp.dot(plo, boxT, preferred_element_type=f32))
                cx_ok = ((x2 + float(c) > -1.0) & (x2 + float(c) < ws)
                         & (px_idx >= 0) & (px_idx < px))
                for r in range(-radius, radius + 1):
                    jy = jnp.clip(iyf + r, 0.0, float(hs - 1))
                    py_idx = jax.lax.convert_element_type(jy, i32) - y0
                    rowsel = (iota_py == jnp.broadcast_to(
                        py_idx, (py, p_lanes)))
                    tap = jnp.sum(jnp.where(rowsel, A, 0.0), axis=0,
                                  keepdims=True)             # [1, P]
                    ry_ok = ((y2 + float(r) > -1.0)
                             & (y2 + float(r) < hs)
                             & (py_idx >= 0) & (py_idx < py))
                    t_i = (r + radius) * size + (c + radius)
                    taps_buf[t_i:t_i + 1] = tap
                    valid = base_ok & cx_ok & ry_ok
                    tapv_buf[t_i:t_i + 1] = valid.astype(f32)
                    # in-image but outside the patch -> coverage loss
                    img_ok = (base_ok & (x2 + float(c) > -1.0)
                              & (x2 + float(c) < ws)
                              & (y2 + float(r) > -1.0)
                              & (y2 + float(r) < hs))
                    state[1] = state[1] + jnp.where(
                        img_ok & ~valid, 1.0, 0.0)

            # 7-accumulator weighted NCC (ncc_accumulate mvs_mode)
            m = jnp.where(lmask & (tapv_buf[...] > 0.5), 1.0, 0.0)
            wr = wgt * taps_buf[...]
            mwl = m * wl
            mwr = m * wr
            S_w = jnp.sum(m * wgt, axis=0, keepdims=True)
            S_l = jnp.sum(mwl, axis=0, keepdims=True)
            S_r = jnp.sum(mwr, axis=0, keepdims=True)
            S_ll = jnp.sum(mwl * wl, axis=0, keepdims=True)
            S_rr = jnp.sum(mwr * wr, axis=0, keepdims=True)
            S_lr = jnp.sum(mwl * wr, axis=0, keepdims=True)
            N = jnp.sum(m, axis=0, keepdims=True)

            have = S_w > _WEPS
            S_w_safe = jnp.where(have, S_w, 1.0)
            meanL = S_l / S_w_safe
            meanR = S_r / S_w_safe
            sum1 = S_lr - meanL * S_r - meanR * S_l + N * meanL * meanR
            sum2 = S_ll - 2 * meanL * S_l + N * meanL * meanL
            sum3 = S_rr - 2 * meanR * S_r + N * meanR * meanR
            denom_ok = sum2 * sum3 >= _WEPS
            ncc = sum1 / jnp.sqrt(jnp.where(denom_ok, sum2 * sum3, 1.0))
            ncc = jnp.where(have & denom_ok & base_ok, ncc, -jnp.inf)
            # peak iff ncc > threshold (multiviewstereo.cpp:589)
            ncc = jnp.where(ncc > thr, ncc, -jnp.inf)
            ncc = jnp.where(nbrv_ref[0, n] > 0.5, ncc, -jnp.inf)
            state[0] = jnp.maximum(state[0], ncc)

        # last neighbour of this label: insert the label's candidate
        # into the ascending top-K list.  The selection replicates
        # mvs_topk_slab's stable argsort-and-drop-smallest exactly:
        # r[j] = t[j+1] if t[j+1] <= c else (c if t[j] <= c else t[j]),
        # with t[K] = +inf — among equal nccs the later (larger) depth
        # lands after existing entries, so for n_topk=1 this IS the WTA
        # ">=" tie rule (mvs_wta_slab).
        @pl.when(n == i32(n_nbr - 1))
        def _():
            c = state[0]
            # no-peak labels carry the reference's (0, -1) default
            # (multiviewstereo.cpp:600-607) — never a real depth
            cd = jnp.where(c > -jnp.inf, depths_ref[0, d], -1.0)
            for j in range(n_topk):
                tj = topn_buf[j:j + 1]
                tdj = topd_buf[j:j + 1]
                if j + 1 < n_topk:
                    take_next = topn_buf[j + 1:j + 2] <= c
                    nn = jnp.where(take_next, topn_buf[j + 1:j + 2],
                                   jnp.where(tj <= c, c, tj))
                    nd = jnp.where(take_next, topd_buf[j + 1:j + 2],
                                   jnp.where(tj <= c, cd, tdj))
                else:
                    nn = jnp.where(tj <= c, c, tj)
                    nd = jnp.where(tj <= c, cd, tdj)
                topn_buf[j:j + 1] = nn
                topd_buf[j:j + 1] = nd
            state[0] = jnp.full((1, p_lanes), -jnp.inf, f32)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_depths * n_nbr), step,
                      0)

    # outputs live in ANY (HBM); small VMEM blocks over [T, ...] arrays
    # are rejected by the TPU lowering, so write via explicit DMA
    for idx, (buf, ref) in enumerate(
            ((topn_buf, ncc_out), (topd_buf, depth_out))):
        dma = pltpu.make_async_copy(buf, ref.at[i],
                                    sems.at[i32(5) + idx])
        dma.start()
        dma.wait()
    dma = pltpu.make_async_copy(state.at[1], oob_out.at[i],
                                sems.at[i32(7)])
    dma.start()
    dma.wait()


def _tile_layout(a, th, tw):
    """[..., H, W] -> [..., n_tiles, th*tw] (2D tile-flattened)."""
    lead = a.shape[:-2]
    h, w = a.shape[-2:]
    a = a.reshape(lead + (h // th, th, w // tw, tw))
    a = jnp.moveaxis(a, -2, -3)           # [..., ty, tx, th, tw]
    return a.reshape(lead + ((h // th) * (w // tw), th * tw))


def _untile(a, h, w, th, tw):
    """[..., n_tiles, th*tw] -> [..., H, W] (leading axes preserved)."""
    lead = a.shape[:-2]
    a = a.reshape(lead + (h // th, w // tw, th, tw))
    a = jnp.moveaxis(a, -2, -3)           # [..., ty, th, tx, tw]
    return a.reshape(lead + (h, w))


@functools.partial(
    jax.jit,
    static_argnames=("radius", "thr", "tile_h", "tile_w", "patch_h",
                     "patch_w", "interpret", "n_topk"))
def pallas_mvs_wta(depths, coords, gray_nbr, gl, lv, weights, nbr_valid,
                   *, radius: int, thr: float, tile_h: int = 16,
                   tile_w: int = 64, patch_h: int = 96, patch_w: int = 256,
                   center_valid=None, interpret: bool = False,
                   n_topk: int = 1):
    """Fused MVS tap + NCC + top-K/WTA sweep.

    depths [D] f32; coords [D, N, 2, H, W] f32 (x2/y2 in the neighbour's
    scaled pixel frame, -3e6 where the base sample is invalid);
    gray_nbr [N, hs, ws] f32; gl/lv/weights [S*S, H, W] (left window
    values / validity / support weights, window-position major);
    nbr_valid [N] bool (padding mask for the stacked neighbours).

    With the default n_topk=1, returns (best_ncc [H, W], best_depth
    [H, W], oob_frac scalar): the raw WTA carry of
    stereo.multiview.mvs_wta_slab (finalize with mvs_finalize_wta).
    With n_topk=K > 1, the first two outputs are [K, H, W] ascending by
    (ncc, depth) — the hypothesis volume of mvs_topk_slab (peaks padded
    with (-inf, -1); callers map -inf -> 0 per multiviewstereo.cpp:
    600-607).  oob_frac is the fraction of in-image taps that fell
    outside the DMA'd patches (coverage diagnostic).

    The depth-label axis composes with slab sharding: callers pass a
    slab's depths/coords and merge raw carries across slabs
    (parallel/depthshard.py) — the ascending-insert tie rule makes the
    merge exact.
    """
    n_depths, n_nbr = coords.shape[0], coords.shape[1]
    h, w = coords.shape[-2:]
    hs, ws = gray_nbr.shape[-2:]
    size = 2 * radius + 1
    f32 = jnp.float32
    assert h % tile_h == 0 and w % tile_w == 0, (h, w, tile_h, tile_w)
    p_lanes = tile_h * tile_w
    n_tiles = (h // tile_h) * (w // tile_w)

    # exact bf16 hi+lo split of the neighbour grays (one-hot matmul
    # selections then reconstruct f32 values to ~2^-18 relative)
    g32 = gray_nbr.astype(f32)
    g_hi = g32.astype(jnp.bfloat16)
    g_lo = (g32 - g_hi.astype(f32)).astype(jnp.bfloat16)
    # pad so every (y0, x0) patch window is in bounds
    hs_p = max(-(-hs // 8) * 8, patch_h)
    ws_p = max(-(-ws // 128) * 128, patch_w)
    patches = jnp.stack([g_hi, g_lo], axis=1)       # [N, 2, hs, ws]
    patches = jnp.pad(patches,
                      ((0, 0), (0, 0), (0, hs_p - hs), (0, ws_p - ws)))

    coords_t = _tile_layout(coords.astype(f32), tile_h,
                            tile_w)                 # [D, N, 2, T, P]
    coords_k = jnp.moveaxis(coords_t, 3, 0)         # [T, D, N, 2, P]

    # per-(tile, n, d) patch offsets from the relevant-coordinate bbox;
    # y0 = -1 marks a dead (no relevant sample) unit for the kernel skip
    x2 = coords_t[:, :, 0]
    y2 = coords_t[:, :, 1]
    rel = ((x2 > _SENTINEL) & (x2 > -size - 1.0) & (x2 < ws + size)
           & (y2 > -size - 1.0) & (y2 < hs + size))
    if center_valid is not None:
        # masked centers never produce output (mvs_finalize_wta) — drop
        # them from the patch bbox so fully-masked tiles go dead (y0=-1)
        # and skip the whole unit in-kernel (~60% of bunny units)
        cv = _tile_layout(jnp.asarray(center_valid, jnp.bool_)[None],
                          tile_h, tile_w)[0]            # [T, P]
        rel = rel & cv[None, None]
    big = jnp.asarray(3e6, f32)
    ymin = jnp.min(jnp.where(rel, y2, big), axis=-1)     # [D, N, T]
    xmin = jnp.min(jnp.where(rel, x2, big), axis=-1)
    alive = jnp.any(rel, axis=-1)
    y0 = jnp.clip((jnp.floor(ymin).astype(jnp.int32) - radius - 1)
                  // 8 * 8, 0, hs_p - patch_h)
    x0 = jnp.clip((jnp.floor(xmin).astype(jnp.int32) - radius - 1)
                  // 128 * 128, 0, ws_p - patch_w)
    y0 = jnp.where(alive, y0, -1)
    offs = jnp.stack([y0, x0], axis=-1)                  # [D, N, T, 2]
    offs = jnp.moveaxis(offs, 2, 0)                      # [T, D, N, 2]
    offs = jnp.moveaxis(offs, 2, 1).astype(jnp.int32)    # [T, N, D, 2]
    flat = n_nbr * n_depths * 2
    lanes = -(-flat // 128) * 128
    offs_pack = jnp.pad(offs.reshape(n_tiles, 1, flat),
                        ((0, 0), (0, 0), (0, lanes - flat)))
    # (moveaxis twice: [D, N, T, 2] -> [T, D, N, 2] -> [T, N, D, 2])

    gl_t = _tile_layout(gl.astype(f32), tile_h, tile_w)      # [25, T, P]
    lv_t = _tile_layout(lv.astype(f32), tile_h, tile_w)
    w_t = _tile_layout(weights.astype(f32), tile_h, tile_w)

    depths_f = depths.astype(f32).reshape(1, -1)
    nbrv_f = jnp.asarray(nbr_valid).astype(f32).reshape(1, -1)

    kernel = functools.partial(
        _mvs_kernel, radius=radius, n_depths=n_depths, n_nbr=n_nbr,
        thr=float(thr), py=patch_h, px=patch_w, p_lanes=p_lanes,
        hs=hs, ws=ws, n_topk=n_topk)

    # output DMAs slice [1, K, P] out of [T, K, P]: the sublane dim
    # must be 8-aligned on real hardware, so K pads up (rows past
    # n_topk carry the (-inf, -1) init and are sliced off below)
    k_pad = -(-n_topk // 8) * 8 if n_topk > 1 else 1
    out_shape = [jax.ShapeDtypeStruct((n_tiles, k_pad, p_lanes), f32),
                 jax.ShapeDtypeStruct((n_tiles, k_pad, p_lanes), f32),
                 jax.ShapeDtypeStruct((n_tiles, 1, p_lanes), f32)]
    with jax.enable_x64(False):
        ncc, depth, oob = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(n_tiles,),
            interpret=(pltpu.InterpretParams(dma_execution_mode="eager")
                       if interpret else False),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # depths
                pl.BlockSpec(memory_space=pltpu.SMEM),   # nbr_valid
                pl.BlockSpec(memory_space=pl.ANY),       # coords (HBM)
                pl.BlockSpec(memory_space=pl.ANY),       # offs (HBM)
                pl.BlockSpec(memory_space=pl.ANY),       # patches (HBM)
                pl.BlockSpec((1, size * size, p_lanes),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # gl
                pl.BlockSpec((1, size * size, p_lanes),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # lv
                pl.BlockSpec((1, size * size, p_lanes),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),   # weights
            ],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            scratch_shapes=[
                pltpu.SMEM((1, -(-(n_nbr * n_depths * 2) // 128) * 128),
                           jnp.int32),                         # offs
                pltpu.VMEM((2, 2, p_lanes), f32),              # coords
                pltpu.VMEM((2, 2, patch_h, patch_w),
                           jnp.bfloat16),                      # patches
                pltpu.VMEM((size * size, p_lanes), f32),       # taps
                pltpu.VMEM((size * size, p_lanes), f32),       # tap valid
                pltpu.VMEM((2, 1, p_lanes), f32),              # ncc/oob
                pltpu.VMEM((k_pad, p_lanes), f32),             # top ncc
                pltpu.VMEM((k_pad, p_lanes), f32),             # top depth
                pltpu.SemaphoreType.DMA((8,)),
            ],
        )(depths_f, nbrv_f, coords_k, offs_pack, patches,
          jnp.moveaxis(gl_t, 0, 1),
          jnp.moveaxis(lv_t, 0, 1),
          jnp.moveaxis(w_t, 0, 1))

    # [T, Kpad, P] -> [K, T, P] -> [K, H, W] (or [H, W] for WTA mode)
    ncc = jnp.moveaxis(ncc[:, :n_topk], 1, 0)
    depth = jnp.moveaxis(depth[:, :n_topk], 1, 0)
    if n_topk == 1:
        ncc, depth = ncc[0], depth[0]
    best_ncc = _untile(ncc, h, w, tile_h, tile_w)
    best_depth = _untile(depth, h, w, tile_h, tile_w)
    # missed (in-image but outside-patch) taps over all possible taps —
    # the coverage diagnostic the bench reports
    oob_frac = jnp.sum(oob[:, 0]) / (float(h * w) * n_depths * n_nbr
                                     * size * size)
    return best_ncc, best_depth, oob_frac
