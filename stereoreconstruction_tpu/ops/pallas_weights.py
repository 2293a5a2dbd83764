"""Pallas TPU kernel: geodesic support weights (Hosni et al. 2009).

The XLA formulation (ops/weights.geodesic_weights) runs ~66 sequential
min-plus row updates over [S, H, W] HBM-resident planes plus 8 im2col'd
neighbor-distance tensors — HBM-traffic bound (~100 ms per bunny view,
~1/3 of the whole depth sweep).  This kernel keeps the full [S*S] window
state in VMEM per row tile:

* state = S*S separate [tile, W] planes, so every window-column shift of
  the sweep is Python index arithmetic (free) instead of a lane shift;
* the 8 neighbor color-distance maps are computed in-kernel from the RGB
  tile and pre-shifted per window column (8*S lane rolls total — the only
  lane ops in the sweep);
* the within-row min-plus chain is the reference's direct recurrence
  ``v[t] = min(u[t], v[t_prev] + d[t])`` (geodesicweight.cpp:84-90),
  unrolled over the S window columns — sequential in t but
  full-tile-wide elementwise on the VPU.

Weight parity: same clamp semantics as
ops/weights.geodesic_weights(exact=False); values agree up to f32
rounding-order (the closed-form chain there associates additions
differently).  Used as the TPU backend of compute_weights for the
production (fast / pallas) paths; the exact/f64 parity path keeps the XLA
formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CLAMP = 4096.0          # weights below exp(-80) are identically zero
_BRK = 2.0 * _CLAMP      # "no edge": breaks min-plus chains

_DIRS = ((-1, -1), (0, -1), (1, -1), (-1, 0),
         (-1, 1), (0, 1), (1, 1), (1, 0))


def _weights_kernel(rgb_hbm, out_ref, rgb_buf, drolls, vrolls, sems, *,
                    radius: int, sigma: float, iters: int,
                    tile_h: int, wh: int):
    size = 2 * radius + 1
    halo = radius + 1
    th = tile_h + 2 * halo                      # window-reachable rows
    th2 = th + 2                                # + 1 row each side for the
    th2a = -(-th2 // 8) * 8                     #   taps; 8-row DMA align
    i32 = jnp.int32
    i = jax.lax.convert_element_type(pl.program_id(0), jnp.int32)
    row0 = i * i32(tile_h)                      # first center row (global)

    # RGB tile + validity plane (channel 3) with halo+1 rows (input is
    # pre-padded by halo+1 rows on top and `halo` lanes on the left).
    # (Indices as i32: global x64 mode makes literals i64, which Mosaic
    # rejects.)
    dma = pltpu.make_async_copy(
        rgb_hbm.at[:, pl.ds(row0, th2a), :], rgb_buf, sems.at[i32(0)])
    dma.start()
    dma.wait()

    def lane_shift(x, k):
        """out[.., c] = x[.., c + k] with wraparound (the pad lanes are
        invalid, so wrapped values are masked off by validity)."""
        if k % wh == 0:
            return x
        return pltpu.roll(x, jnp.int32((-k) % wh), x.ndim - 1)

    def row_shift(x, k):
        """out[r, c] = x[r + k, c] with wraparound.  All consumers slice
        rows [1, th) only, so the wrapped first/last rows are dead."""
        if k % th2a == 0:
            return x
        return pltpu.roll(x, jnp.int32((-k) % th2a), 0)

    # validity of buffered pixel (r, c): channel 3 of the input carries
    # the (pre-padded, exact — pad rows/lanes are 0) validity plane.  For
    # a full image this equals the in-image predicate; row-sharded blocks
    # pass global-row validity so pad rows break chains exactly like
    # image borders (the pixel_valid path of ops/weights.py).
    v_ext = rgb_buf[3]

    # 8 neighbor color-distance maps over the full aligned buffer,
    # pre-shifted per window column:
    # drolls[dir*S + t] = D_dir lane-shifted by t - R.
    # Every plane keeps the aligned offset-0 [th2a, wh] layout; shifts
    # are wraparound rolls whose wrapped rows/lanes are invalid or dead.
    chans = [rgb_buf[c] for c in range(3)]

    for di, (dx, dy) in enumerate(_DIRS):
        acc = None
        for ch in chans:
            d = lane_shift(row_shift(ch, dy), dx) - ch
            acc = d * d if acc is None else acc + d * d
        dist = jnp.sqrt(acc)
        nb_valid = lane_shift(row_shift(v_ext, dy), dx)
        dist = jnp.where((nb_valid > 0.5) & (v_ext > 0.5),
                         jnp.minimum(dist, _BRK), _BRK)
        for t in range(size):
            drolls[di * size + t] = lane_shift(dist, t - radius)
    for t in range(size):
        vrolls[t] = lane_shift(v_ext, t - radius)

    def wd(dx, dy, s, t):
        """Windowed neighbor distance at every center: value for window
        pixel (s, t) of center (row j, lane c) =
        D_dir[j + s - R + halo + 1, c + t - R] in buffer coords."""
        di = _DIRS.index((dx, dy))
        r0 = halo + 1 + s - radius
        return drolls[di * size + t, r0:r0 + tile_h, :]

    def valid_st(s, t):
        r0 = halo + 1 + s - radius
        return vrolls[t, r0:r0 + tile_h, :] > 0.5

    vmask = [[valid_st(s, t) for t in range(size)] for s in range(size)]

    # State: S*S planes [tile, wh] (weights.py exact=False init).
    big = jnp.full((tile_h, wh), _CLAMP, jnp.float32)
    rows = [[big for _ in range(size)] for _ in range(size)]
    rows[radius][radius] = jnp.zeros((tile_h, wh), jnp.float32)

    def row_update(rows_s, prev, s, dy):
        """One sweep row update.  ``prev`` is the already-final neighbor
        window row (s-1 for the forward sweep / s+1 for backward); the
        within-row chain runs toward +t for fwd (left-neighbor distances)
        and toward -t for bwd, matching weights.py fwd_row/bwd_row."""
        u = []
        for t in range(size):
            c = rows_s[t]
            if prev is not None:
                for dx in (-1, 0, 1):
                    tn = t + dx   # state index holding the dx-shifted col
                    if 0 <= tn < size:
                        c = jnp.minimum(c, prev[tn] + wd(dx, dy, s, t))
            u.append(jnp.where(vmask[s][t], c, rows_s[t]))
        v = list(u)
        if dy == -1:      # forward: v[t] = min(u[t], v[t-1] + d_left[t])
            for t in range(1, size):
                v[t] = jnp.minimum(v[t], v[t - 1] + wd(-1, 0, s, t))
        else:             # backward: v[t] = min(u[t], v[t+1] + d_right[t])
            for t in range(size - 2, -1, -1):
                v[t] = jnp.minimum(v[t], v[t + 1] + wd(1, 0, s, t))
        return [jnp.where(vmask[s][t], v[t], u[t]) for t in range(size)]

    for _ in range(iters):
        for s in range(size):
            rows[s] = row_update(rows[s], rows[s - 1] if s else None,
                                 s, -1)
        for s in range(size - 1, -1, -1):
            rows[s] = row_update(
                rows[s], rows[s + 1] if s < size - 1 else None, s, 1)

    inv_sigma = jnp.float32(1.0 / sigma)
    for s in range(size):
        for t in range(size):
            out_ref[s * size + t] = jnp.exp(
                -jnp.minimum(rows[s][t], _CLAMP) * inv_sigma)


@functools.partial(
    jax.jit, static_argnames=("radius", "sigma", "iters", "tile_h",
                              "interpret"))
def pallas_geodesic_weights(rgb, radius: int, sigma: float = 50.0,
                            iters: int = 3, tile_h: int = 32,
                            interpret: bool = False, valid=None):
    """Geodesic support weights on TPU: rgb [H, W, 3] -> [S, S, H, W].

    ``valid`` ([H, W] bool, optional) overrides the in-image validity
    plane — the row-sharded engine passes global-row validity so pad rows
    of a block behave exactly like image borders (parallel/rowshard.py)."""
    size = 2 * radius + 1
    halo = radius + 1
    h_in, w = rgb.shape[:2]
    # Pad rows to a tile multiple instead of shrinking the tile (see
    # pallas_ncc.pallas_cost_wta): pad rows are invalid, so they behave
    # exactly like the image border and are sliced off the output.
    h = -(-h_in // tile_h) * tile_h
    n_tiles = h // tile_h

    f32 = jnp.float32
    wh = -(-(w + 2 * halo) // 128) * 128
    th2 = tile_h + 2 * halo + 2
    th2a = -(-th2 // 8) * 8
    h_pad = (n_tiles - 1) * tile_h + th2a
    if valid is None:
        valid_f = jnp.ones((h_in, w), f32)
    else:
        valid_f = jnp.asarray(valid).astype(f32)
    chans = jnp.concatenate(
        [jnp.moveaxis(rgb.astype(f32), -1, 0), valid_f[None]], axis=0)
    rgb_p = jnp.pad(chans,
                    ((0, 0), (halo + 1, h_pad - h_in - halo - 1),
                     (halo, wh - w - halo)))

    kernel = functools.partial(
        _weights_kernel, radius=radius, sigma=sigma, iters=iters,
        tile_h=tile_h, wh=wh)

    # The package enables x64 globally (calibration needs f64); Mosaic
    # rejects 64-bit values, so the kernel traces under disable_x64.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((size * size, h, wh), f32),
            grid=(n_tiles,),
            interpret=(pltpu.InterpretParams(dma_execution_mode="eager")
                   if interpret else False),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((size * size, tile_h, wh),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((4, th2a, wh), f32),           # rgb+valid tile
                pltpu.VMEM((8 * size, th2a, wh), f32),    # shifted dists
                pltpu.VMEM((size, th2a, wh), f32),        # shifted valid
                pltpu.SemaphoreType.DMA((1,)),
            ],
        )(rgb_p)
    return out[:, :h_in, halo:halo + w].reshape(size, size, h_in, w)
