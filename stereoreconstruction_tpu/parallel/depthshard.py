"""Depth-slab sharded MVS initial estimate (the ring-attention analog).

SURVEY §5 names this the core distribution idea for the cost-volume sweep:
the depth-label axis is partitioned over a "depth" mesh axis; each device
sweeps only its slab of the whole-volume loop the reference runs per pixel
(multiviewstereo.cpp:574-602), producing a *local* WTA carry / top-K peak
list; one merge collective (all_gather + local re-select,
parallel/collectives.merge_topk — the blockwise-softmax-merge analog for
peak lists) combines the slabs.  Inputs are replicated (images are tiny
next to the [D, H, W] sweep work), so the sweep itself runs with zero
communication and the only collective is the [K, H, W] merge at the end.

Composes with the row sharding of parallel/rowshard.py via a
("row", "depth") mesh in principle; this module owns the depth axis.

Correctness: slab boundaries are exact — the reference's tie rule (equal
NCC -> larger depth wins, via peaks.back() after a stable sort on
(cost, depth)) is associative across ascending-depth slabs, so the merged
result equals the unsharded scan bit-for-bit (tests/test_depthshard.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MultiViewConfig
from ..geometry.camera import Camera
from ..stereo.multiview import (
    _build_mvs_cost_fn,
    mvs_wta_slab,
    mvs_topk_slab,
    mvs_finalize_wta,
)
from .collectives import merge_topk


def make_depth_mesh(n_depth: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices[:n_depth]), ("depth",))


def mvs_initial_estimate_depthsharded(
        mesh: Mesh, rgb_ref, gray_ref, mask_ref, grays_nbr, masks_nbr,
        cam_ref: Camera, cams_nbr: Camera, cfg: MultiViewConfig, *,
        enable_refraction=True, enable_distortion=True, with_topk=False,
        method="fast", nbr_valid=None, compile_only=False):
    """Depth-sharded equivalent of ``mvs_initial_estimate_oneview``.
    cfg.num_depth_levels must be divisible by the "depth" axis size.
    Returns the same values as the unsharded function (replicated on
    every device).

    method: "fast" (XLA warp-tap backend) or "pallas" — the production
    fused patch kernel (ops/pallas_mvs.py) driven through its
    (label0, n_labels) slab interface; each device's kernel sweeps only
    its slab and the raw carries merge with the same ascending-insert
    tie rule, so slab results are bit-equal to the unsharded kernel
    (tests/test_depthshard.py slab-contract tests; real-chip shard_map
    attestation in scripts/check_radius5_parity.py — the interpret-mode
    kernel cannot execute inside CPU shard_map partitions)."""
    n_dep = mesh.shape["depth"]
    D = cfg.num_depth_levels
    if D % n_dep:
        raise ValueError(f"num_depth_levels {D} not divisible by depth "
                         f"axis {n_dep}")
    slab = D // n_dep

    dtype = jnp.asarray(gray_ref).dtype
    h, w = gray_ref.shape

    def body(rgb_ref, gray_ref, mask_ref, grays_nbr, masks_nbr,
             cam_ref, cams_nbr):
        label0 = jax.lax.axis_index("depth") * slab
        if method == "pallas":
            from ..stereo.multiview import _mvs_pallas_sweep
            raw = _mvs_pallas_sweep(
                rgb_ref, gray_ref, mask_ref, grays_nbr, masks_nbr,
                cam_ref, cams_nbr, cfg,
                enable_refraction=enable_refraction,
                enable_distortion=enable_distortion,
                nbr_valid=nbr_valid, with_topk=with_topk,
                label0=label0, n_labels=slab)
            if not with_topk:
                ncc, dep = raw
            else:
                top_ncc, top_depth = raw
        else:
            plane_cost, depths = _build_mvs_cost_fn(
                rgb_ref, gray_ref, mask_ref, grays_nbr, masks_nbr,
                cam_ref, cams_nbr, cfg,
                enable_refraction=enable_refraction,
                enable_distortion=enable_distortion, method="fast",
                nbr_valid=nbr_valid)
            if not with_topk:
                ncc, dep = mvs_wta_slab(plane_cost, depths, cfg, (h, w),
                                        dtype, label0=label0,
                                        n_labels=slab)
            else:
                top_ncc, top_depth = mvs_topk_slab(
                    plane_cost, depths, cfg, (h, w), dtype,
                    label0=label0, n_labels=slab)

        if not with_topk:
            # cross-slab merge with the sequential tie rule: slabs are in
            # ascending-depth axis order, so a later slab wins ties (>=).
            all_ncc = jax.lax.all_gather(ncc, "depth")       # [S, H, W]
            all_dep = jax.lax.all_gather(dep, "depth")
            best_ncc, best_depth = all_ncc[0], all_dep[0]
            for j in range(1, n_dep):
                better = all_ncc[j] >= best_ncc
                best_depth = jnp.where(better, all_dep[j], best_depth)
                best_ncc = jnp.where(better, all_ncc[j], best_ncc)
            return mvs_finalize_wta(best_ncc, best_depth, mask_ref)

        # merge_topk: all_gather slabs (ascending depth order) + stable
        # re-select — among equal NCCs the larger depth survives, matching
        # the unsharded sequential insertion.
        top_ncc, top_depth = merge_topk(top_ncc, top_depth, cfg.top_k,
                                        "depth")
        top_ncc = jnp.where(jnp.isfinite(top_ncc), top_ncc, 0.0)
        return top_ncc, top_depth

    rep = P()
    n_in = 7
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(rep,) * n_in,
        out_specs=rep if not with_topk else (rep, rep),
        check_vma=False))
    put = lambda x: jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P()))
    args = (put(jnp.asarray(rgb_ref, dtype)), put(gray_ref),
            put(jnp.asarray(mask_ref, bool)), put(grays_nbr),
            put(masks_nbr), jax.tree.map(put, cam_ref),
            jax.tree.map(put, cams_nbr))
    if compile_only:
        # SPMD lowering check without executing — the interpret-mode
        # Pallas kernel cannot run inside CPU shard_map partitions
        # (callback-DMA deadlock); __graft_entry__.dryrun_multichip uses
        # this for the slab-pallas path, which executes for real on the
        # chip (scripts/check_radius5_parity.py, depthshard_pallas_ok)
        return fn.lower(*args).compile()
    return fn(*args)
