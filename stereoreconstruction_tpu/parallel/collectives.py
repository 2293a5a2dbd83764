"""Collectives for sharded stereo/calibration.

* ``merge_topk``: the depth-axis sharding primitive — each device computes
  its local top-K (ncc, depth) peaks over its depth slab; an all-gather +
  local re-select merges them (the blockwise-softmax-merge analog for
  peak lists, SURVEY §5).
* ``ba_normal_equations_psum``: observation-sharded Schur blocks reduced
  with psum (wraps calib.bundle.schur_blocks_psum for shard_map use).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def local_topk(ncc, depth, k: int):
    """Top-k by ncc (ties -> larger depth) along the leading axis.

    ncc/depth: [D, ...]. Returns ([k, ...], [k, ...]) ascending by ncc.
    """
    order = jnp.argsort(ncc, axis=0)
    ncc_s = jnp.take_along_axis(ncc, order, axis=0)
    dep_s = jnp.take_along_axis(depth, order, axis=0)
    return ncc_s[-k:], dep_s[-k:]


def merge_topk(local_ncc, local_depth, k: int, axis_name: str):
    """Merge per-device top-k lists across a mesh axis.

    local_ncc/local_depth: [k, ...] on each device.  Returns the global
    top-k (identical on every device).
    """
    all_ncc = jax.lax.all_gather(local_ncc, axis_name)     # [S, k, ...]
    all_dep = jax.lax.all_gather(local_depth, axis_name)
    flat_n = all_ncc.reshape((-1,) + all_ncc.shape[2:])
    flat_d = all_dep.reshape((-1,) + all_dep.shape[2:])
    return local_topk(flat_n, flat_d, k)


def ba_normal_equations_psum(poses, points, Ks, cam_idx, pt_idx, meas,
                             n_cams: int, n_pts: int, axis_name: str):
    """Schur blocks of this device's observation shard, psum-reduced."""
    from ..calib.bundle import schur_blocks_psum
    return schur_blocks_psum(poses, points, Ks, cam_idx, pt_idx, meas,
                             n_cams, n_pts, axis_name)
