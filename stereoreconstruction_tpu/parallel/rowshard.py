"""Explicit row-sharded two-view engine (shard_map, halo-overlapped blocks).

The reference parallelizes the per-pixel loops with OpenMP/TBB over image
rows (twoviewstereo.cpp:265, 436).  Round-1's GSPMD auto-sharding of the
same computation hit "[SPMD] Involuntary full rematerialization" on the
banded-warp gather — the compiler replicated the warped planes to re-shard
them.  This module owns the partition explicitly instead:

* the reference view is split into **halo-overlapped row blocks** (halo =
  window_radius + 1 covers the support window and the geodesic-weight
  neighbor taps), built once on the host — the halo exchange is done at
  input construction, so the depth sweep runs with **zero collectives**;
* the other view is replicated (one [H, W] image per device — the epipolar
  band an individual block reads is data-dependent, and a full image is
  tiny next to the [D, H, W] sweep);
* every block computes global-coordinate rays/weights/validity via the
  row0/full_h block support in stereo/twoview.py, so block outputs equal
  the unsharded ones bit-for-bit (asserted in tests/test_rowshard.py);
* the only communication is two [H, W] all-gathers for the sequential
  symmetric cross-check (the right pass must see the already-invalidated
  left map, twoviewstereo.cpp:596-672).

Mesh axes: ("view", "row") — "view" is data-parallel over pairs, "row"
partitions each image's rows.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TwoViewConfig
from ..geometry.camera import Camera
from ..stereo.twoview import (
    compute_depth_map_oneview,
    cross_check_direction,
)
from .sharding import make_mesh, stack_cameras  # noqa: F401 (re-export)


def overlap_blocks(x: np.ndarray, n_blocks: int, halo: int,
                   fill=0.0) -> np.ndarray:
    """Split rows of ``x [..., H, W(, C)]`` (rows = axis -2 or -3) into
    ``n_blocks`` halo-overlapped blocks along a new axis.

    x: [H, W] or [H, W, C].  Returns [n_blocks, tile + 2*halo, W(, C)];
    H is padded up to a multiple of n_blocks with ``fill`` first.
    """
    x = np.asarray(x)
    h = x.shape[0]
    tile = -(-h // n_blocks)
    pad_rows = n_blocks * tile - h
    pad = [(halo, pad_rows + halo)] + [(0, 0)] * (x.ndim - 1)
    xp = np.pad(x, pad, constant_values=fill)
    blocks = [xp[i * tile: i * tile + tile + 2 * halo] for i in
              range(n_blocks)]
    return np.stack(blocks)


def _unblock(blocks: jnp.ndarray, h: int) -> jnp.ndarray:
    """Inverse of overlap_blocks for outputs whose halo rows were already
    trimmed: blocks [n_blocks, tile, W] -> [h, W]."""
    n_blocks, tile, w = blocks.shape[:3]
    return blocks.reshape((n_blocks * tile,) + blocks.shape[2:])[:h]


def twoview_pairs_rowsharded(
        mesh: Mesh, rgbs_l, masks_l, rgbs_r, masks_r,
        cams_l: Camera, cams_r: Camera, cfg: TwoViewConfig, *,
        cross_check: bool = True,
        enable_refraction: bool = True, enable_distortion: bool = True,
        method: str = "auto",
        dtype=jnp.float32, return_compiled: bool = False):
    """Cross-checked depth maps for a batch of view pairs, explicitly
    sharded over a ("view", "row") mesh.

    rgbs_*: [Pairs, H, W, 3] (0..255, already scaled); masks_*: [Pairs, H, W]
    bool; cams_*: stacked Camera pytrees with leading axis Pairs.  Pairs must
    be divisible by the "view" axis size.  Returns depth maps
    ([Pairs, H, W], [Pairs, H, W]) — left then right; with
    ``return_compiled`` also the compiled SPMD executable (for HLO
    cost/communication analysis, scripts/scaling_analysis.py).

    method: "auto" (Pallas fused kernel on TPU, XLA fast path elsewhere),
    "pallas", or "fast" — each block runs the same backend as the
    unsharded engine, with global-coordinate validity.
    """
    from ..stereo.twoview import resolve_method
    method = resolve_method(method, cfg)
    n_view = mesh.shape["view"]
    n_row = mesh.shape["row"]
    halo = cfg.window_radius + 1

    rgbs_l = np.asarray(rgbs_l, np.float32)
    rgbs_r = np.asarray(rgbs_r, np.float32)
    n_pairs, h, w = rgbs_l.shape[:3]
    if n_pairs % n_view:
        raise ValueError(
            f"n_pairs={n_pairs} not divisible by 'view' axis ({n_view})")
    tile = -(-h // n_row)

    def prep(rgbs, masks):
        rgb_b = np.stack([overlap_blocks(r, n_row, halo) for r in rgbs])
        mask_b = np.stack([overlap_blocks(m, n_row, halo, fill=False)
                           for m in np.asarray(masks, bool)])
        return rgb_b, mask_b                 # [P, n_row, bh, W(,3)]

    rgb_lb, mask_lb = prep(rgbs_l, masks_l)
    rgb_rb, mask_rb = prep(rgbs_r, masks_r)

    cast = lambda c: c.astype(dtype)
    cams_l = jax.tree.map(jnp.asarray, cast(cams_l))
    cams_r = jax.tree.map(jnp.asarray, cast(cams_r))

    blk_sh = NamedSharding(mesh, P("view", "row"))
    cam_sh = NamedSharding(mesh, P("view"))
    out_sh = NamedSharding(mesh, P("view", "row"))

    multi_host = jax.process_count() > 1

    def put(x, sh):
        """Host-local full array -> global sharded array.

        `jax.device_put` of a host-local array onto a sharding that
        spans non-addressable devices is JAX-version-sensitive (ADVICE
        r3); on multi-host clusters route through
        make_array_from_process_local_data, which slices each process's
        addressable shards out of the (identical) full array every host
        holds."""
        x = np.asarray(x)
        if multi_host:
            return jax.make_array_from_process_local_data(
                sh, x, global_shape=x.shape)
        return jax.device_put(jnp.asarray(x), sh)

    rgb_lb = put(rgb_lb.astype(np.float32), blk_sh)
    mask_lb = put(mask_lb, blk_sh)
    rgb_rb = put(rgb_rb.astype(np.float32), blk_sh)
    mask_rb = put(mask_rb, blk_sh)
    # full other-view images, replicated over "row"
    img_sh = NamedSharding(mesh, P("view"))
    rgb_lf = put(rgbs_l, img_sh)
    rgb_rf = put(rgbs_r, img_sh)
    mask_lf = put(np.asarray(masks_l, bool), img_sh)
    mask_rf = put(np.asarray(masks_r, bool), img_sh)
    pcam = lambda c: jax.tree.map(
        lambda x: put(np.asarray(x), cam_sh), c)
    cams_l, cams_r = pcam(cams_l), pcam(cams_r)

    luma = lambda im: (0.11 * im[..., 0] + 0.59 * im[..., 1]
                       + 0.3 * im[..., 2]).astype(dtype)

    def block_depth(rgb_blk, mask_blk, rgb_oth_full, mask_oth_full,
                    cam_ref, cam_oth):
        """WTA depth for this device's row block of one pair."""
        row0 = jax.lax.axis_index("row") * tile - halo
        gray_blk = luma(rgb_blk.astype(dtype))
        gray_oth = luma(rgb_oth_full.astype(dtype))
        d = compute_depth_map_oneview(
            rgb_blk.astype(dtype), gray_blk, mask_blk, gray_oth,
            mask_oth_full, cam_ref, cam_oth, cfg,
            enable_refraction=enable_refraction,
            enable_distortion=enable_distortion, method=method,
            row0=row0, full_h=h)
        return d[halo:halo + tile]           # trim halo rows

    def gather_rows(blk):
        """[tile, W] block -> full [H_pad, W] map on every device."""
        full = jax.lax.all_gather(blk, "row")        # [n_row, tile, W]
        return full.reshape(n_row * tile, w)

    def shard_body(rgb_lb, mask_lb, rgb_rb, mask_rb,
                   rgb_lf, mask_lf, rgb_rf, mask_rf, cam_l, cam_r):
        # leading axes: [P/n_view, 1(row), ...] — vmap over local pairs
        def one_pair(rgb_lb, mask_lb, rgb_rb, mask_rb,
                     rgb_lf, mask_lf, rgb_rf, mask_rf, cam_l, cam_r):
            dl = block_depth(rgb_lb, mask_lb, rgb_rf, mask_rf,
                             cam_l, cam_r)
            dr = block_depth(rgb_rb, mask_rb, rgb_lf, mask_lf,
                             cam_r, cam_l)
            if not cross_check:
                return dl, dr
            row0 = jax.lax.axis_index("row") * tile
            # sequential symmetric order (right sees invalidated left)
            dr_full = gather_rows(dr)
            dl = cross_check_direction(
                dl, dr_full, cam_l, cam_r, cfg.image_scale,
                cfg.inconsistency_thresh,
                enable_refraction=enable_refraction,
                enable_distortion=enable_distortion, row0=row0)
            dl_full = gather_rows(dl)
            dr = cross_check_direction(
                dr, dl_full, cam_r, cam_l, cfg.image_scale,
                cfg.inconsistency_thresh,
                enable_refraction=enable_refraction,
                enable_distortion=enable_distortion, row0=row0)
            return dl, dr

        args = [x[:, 0] for x in (rgb_lb, mask_lb, rgb_rb, mask_rb)]
        full = [rgb_lf, mask_lf, rgb_rf, mask_rf]
        # Python unroll over this device's local pairs (NOT vmap: the
        # Pallas kernel's manual `.at[d, rows, :]` HBM DMAs don't carry a
        # vmap batch dim — vmapping it reads out of bounds.  Local pairs
        # are usually 1; each pair saturates the chip anyway.)
        n_local = args[0].shape[0]
        outs = [one_pair(*(x[i] for x in args),
                         *(f[i] for f in full),
                         jax.tree.map(lambda x: x[i], cam_l),
                         jax.tree.map(lambda x: x[i], cam_r))
                for i in range(n_local)]
        dl = jnp.stack([o[0] for o in outs])
        dr = jnp.stack([o[1] for o in outs])
        return dl[:, None], dr[:, None]      # restore the "row" dim

    spec_blk = P("view", "row")
    spec_full = P("view")
    fn = jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(spec_blk, spec_blk, spec_blk, spec_blk,
                  spec_full, spec_full, spec_full, spec_full,
                  spec_full, spec_full),
        out_specs=(spec_blk, spec_blk),
        check_vma=False))
    args = (rgb_lb, mask_lb, rgb_rb, mask_rb,
            rgb_lf, mask_lf, rgb_rf, mask_rf, cams_l, cams_r)
    compiled = None
    if return_compiled == "compile_only":
        # HLO/cost analysis without executing (scaling model runs this
        # for the Pallas path on >4 virtual CPU devices, where the
        # interpret-mode kernel's callback DMAs deadlock at run time)
        return fn.lower(*args).compile()
    if return_compiled:
        compiled = fn.lower(*args).compile()
        dl_b, dr_b = compiled(*args)
    else:
        dl_b, dr_b = fn(*args)
    # [P, n_row, tile, W] -> [P, H, W]
    unb = lambda b: jax.vmap(lambda x: _unblock(x, h))(b)
    if return_compiled:
        return unb(dl_b), unb(dr_b), compiled
    return unb(dl_b), unb(dr_b)
