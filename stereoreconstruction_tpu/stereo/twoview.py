"""Two-view dense stereo engine.

TPU-native re-design of ``TwoViewStereo`` (stereo/twoviewstereo.cpp):
depth-sweep weighted-NCC cost volume + sequential-semantics WTA with
second-best ambiguity rejection + symmetric cross-check.

The per-depth plane is computed inside a ``lax.scan`` so the full ``[D,H,W]``
cost volume never materializes in HBM; each plane is one fused
gather+VPU pass.  WTA carries (minCost, secondBest, bestDepth) through the
scan with the reference's exact sequential update rule (twoviewstereo.cpp:
320-326): a depth wins only if it improves by more than 1e-10, and
"second best" is the previous best at that moment (not the global second
minimum) — both replicated because they gate the ambiguity rejection
``minCost > 0.95 * secondBest`` (twoviewstereo.cpp:304).

NaN = never evaluated / masked; +inf = evaluated but rejected.  Matches the
reference's DepthMap sentinel conventions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import TwoViewConfig
from ..geometry.camera import Camera, project, unproject, principal_ray
from ..ops.ncc import _left_windows, twoview_cost_plane, sad_cost_plane
from ..ops.weights import compute_weights
from ..runtime.trace import trace
from .depthsweep import (
    depth_labels_twoview,
    pixel_rays,
    point_from_depth,
    match_points,
    sweep_points,
)


class TwoViewResult(NamedTuple):
    depth_left: jnp.ndarray    # [H, W]
    depth_right: jnp.ndarray   # [H, W]


def _host_refractive(cam: Camera) -> bool:
    """Camera::isRefractive_ evaluated on host scalars (no device op)."""
    return (abs(float(np.asarray(cam.refr_index)) - 1.0) > 1e-10
            and abs(float(np.asarray(cam.plane_dist))) > 1e-10)


def _host_distorted(cam: Camera) -> bool:
    return bool(np.any(np.abs(np.asarray(cam.dist)) > 1e-10))


def resolve_method(method: str, cfg: TwoViewConfig = None) -> str:
    """Resolve method="auto" to the fastest backend for this platform:
    the fused Pallas NCC/WTA kernel on TPU (BENCH_r04: ~5.4 vs ~2.8
    views/s for the XLA fast path), the XLA fast path elsewhere (the
    kernel only runs under the slow interpret mode off-TPU).  SAD cost
    has no Pallas kernel."""
    if method != "auto":
        return method
    if cfg is not None and cfg.cost == "sad":
        return "fast"
    return "pallas" if jax.default_backend() == "tpu" else "fast"


def _wta_scan(cost_fn, depths, init_shape, dtype):
    """Sequential WTA over depth labels with reference tie/second-best
    semantics."""
    inf = jnp.full(init_shape, jnp.inf, dtype)
    nan = jnp.full(init_shape, jnp.nan, dtype)

    def body(carry, d_idx):
        min_cost, second, best = carry
        cost, depth_value = cost_fn(d_idx)
        better = cost + 1e-10 < min_cost
        second = jnp.where(better, min_cost, second)
        min_cost = jnp.where(better, cost, min_cost)
        best = jnp.where(better, depth_value, best)
        return (min_cost, second, best), ()

    (min_cost, second, best), _ = lax.scan(
        body, (inf, inf, nan), jnp.arange(len(depths)))
    return min_cost, second, best


class _ViewSetup(NamedTuple):
    """Per-view geometry/validity shared between the cost closure and the
    Pallas warp loop."""
    ray_o: jnp.ndarray
    ray_d: jnp.ndarray
    normal: jnp.ndarray
    center: jnp.ndarray
    inb: jnp.ndarray        # [H, W] sample() validity (global coords)
    mask_ref: jnp.ndarray   # mask restricted to in-image (global) rows


def _build_cost_fn(rgb_ref, gray_ref, mask_ref, gray_oth, mask_oth,
                   cam_ref: Camera, cam_oth: Camera, cfg: TwoViewConfig,
                   *, enable_refraction, enable_distortion, method,
                   row0=0, full_h=None):
    """Shared per-view setup: returns ``(cost_at, depths, weights, aux)``
    where ``cost_at(d_idx) -> (cost [H, W], depth_plane [H, W])`` and
    ``aux`` is a ``_ViewSetup``.

    Reused by the WTA scan, the MRF volume build, the Pallas warp loop and
    the row/depth-sharded engines (parallel/).

    row0/full_h: when the reference view is a *block* of global rows
    [row0, row0 + H) out of a full_h-row image (row-sharded path), rays,
    weights and sample-validity are computed against global coordinates so
    block results equal the unsharded ones; pad rows (outside [0, full_h))
    behave exactly like image borders.  row0 may be traced; requires
    method "fast" or "pallas" (blocks of the exact path are not
    supported).
    """
    from ..ops.ncc_fast import make_ref_view, warp_other, fast_cost_plane

    dtype = gray_ref.dtype
    h, w = gray_ref.shape
    radius = cfg.window_radius

    if full_h is None:
        pixel_valid = None
        inb = None
    else:
        if method not in ("fast", "pallas") or cfg.cost == "sad":
            raise NotImplementedError(
                "row-sharded blocks support fast/pallas NCC only")
        rows_g = row0 + jnp.arange(h)
        in_rows = (rows_g >= 0) & (rows_g < full_h)
        pixel_valid = jnp.broadcast_to(in_rows[:, None], (h, w))
        # sample() validity excludes the global last row/column
        inb = (pixel_valid & (rows_g < full_h - 1)[:, None]
               & (jnp.arange(w) < w - 1)[None, :])
        mask_ref = mask_ref & pixel_valid

    weights = compute_weights(rgb_ref, radius, cfg.weights,
                              exact=(method == "exact"),
                              pixel_valid=pixel_valid).astype(dtype)
    if method == "exact" or cfg.cost == "sad":
        left_vals, left_valid, left_mask = _left_windows(
            gray_ref, mask_ref, radius, use_sample=True)
    else:
        ref_view = make_ref_view(gray_ref, mask_ref, weights, radius,
                                 inb=inb)

    ray_o, ray_d = pixel_rays(cam_ref, h, w, cfg.image_scale,
                              enable_refraction=enable_refraction,
                              enable_distortion=enable_distortion,
                              dtype=dtype, row0=row0)
    depths = depth_labels_twoview(cfg.min_depth, cfg.max_depth,
                                  cfg.num_depth_levels, dtype=dtype)

    _, pr_dir = principal_ray(cam_ref)
    normal = pr_dir.astype(dtype)
    center = cam_ref.C.astype(dtype)

    if inb is None:
        inb = jnp.ones((h, w), bool).at[-1, :].set(False).at[:, -1].set(
            False)
    aux = _ViewSetup(ray_o=ray_o, ray_d=ray_d, normal=normal,
                     center=center, inb=inb, mask_ref=mask_ref)

    def cost_at(d_idx):
        depth = depths[d_idx]
        pts, pvalid = point_from_depth(ray_o, ray_d, center, normal, depth)
        xy, mvalid = match_points(
            cam_oth, pts, pvalid, cfg.image_scale,
            enable_refraction=enable_refraction,
            enable_distortion=enable_distortion)
        if cfg.cost == "sad":
            cost = sad_cost_plane(
                gray_ref, left_vals, left_valid, left_mask,
                gray_oth, mask_oth, weights, xy, mvalid,
                radius=radius, max_color_diff=cfg.max_color_diff,
                bad_ret=cfg.bad_ret)
        elif method == "exact":
            cost = twoview_cost_plane(
                gray_ref, left_vals, left_valid, left_mask,
                gray_oth, mask_oth, weights, xy, mvalid,
                radius=radius, max_color_diff=cfg.max_color_diff,
                bad_ret=cfg.bad_ret)
        else:
            warped, wvalid = warp_other(
                gray_oth, mask_oth, xy[..., 0], xy[..., 1], mvalid)
            cost = fast_cost_plane(
                ref_view, warped, wvalid,
                max_color_diff=cfg.max_color_diff, bad_ret=cfg.bad_ret)
        return cost, jnp.full((h, w), depth, dtype)

    return cost_at, depths, weights, aux


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "enable_refraction", "enable_distortion",
                     "method"))
def twoview_cost_volume(rgb_ref, gray_ref, mask_ref, gray_oth, mask_oth,
                        cam_ref: Camera, cam_oth: Camera,
                        cfg: TwoViewConfig, *,
                        enable_refraction: bool = True,
                        enable_distortion: bool = True,
                        method: str = "fast"):
    """Materialize the dense two-view cost volume [D, H, W] (plus the depth
    labels [D]) — the tensor the reference's USE_MRF path feeds to graph-cut
    (twoviewstereo.cpp:335-403).  For WTA use compute_depth_map_oneview,
    which streams planes through a scan instead."""
    cost_at, depths, _, _ = _build_cost_fn(
        rgb_ref, gray_ref, mask_ref, gray_oth, mask_oth, cam_ref, cam_oth,
        cfg, enable_refraction=enable_refraction,
        enable_distortion=enable_distortion, method=method)

    def collect(_, d_idx):
        cost, _ = cost_at(d_idx)
        return (), cost

    _, volume = lax.scan(collect, (), jnp.arange(cfg.num_depth_levels))
    return volume, depths


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "enable_refraction", "enable_distortion",
                     "method", "use_mrf", "full_h"))
def compute_depth_map_oneview(
        rgb_ref, gray_ref, mask_ref, gray_oth, mask_oth,
        cam_ref: Camera, cam_oth: Camera, cfg: TwoViewConfig,
        *, enable_refraction: bool = True, enable_distortion: bool = True,
        method: str = "fast", use_mrf: bool = False,
        row0=0, full_h: Optional[int] = None):
    """Depth map for one reference view against one other view.

    rgb_ref: [H, W, 3]; gray/masks: [H, W].  Cameras must be cast to the
    working dtype already.  Returns depth [H, W] (NaN/inf sentinels).

    method:
      "fast"  — gather-free warp-first cost volume (MXU warp matmuls,
                reference-space support windows; see ops/ncc_fast.py),
      "pallas" — fast warp volume + the fused Pallas NCC/WTA kernel
                (VMEM-resident weights across the whole depth sweep),
      "exact" — other-space window taps bit-matching the reference's
                cost_ncc semantics (gather-bound on TPU; used for parity).

    row0/full_h: the reference view is a block of global rows
    [row0, row0 + H) of a full_h-row image (row-sharded path, see
    parallel/rowshard.py); requires method="fast" and no MRF.
    """
    dtype = gray_ref.dtype
    h, w = gray_ref.shape
    radius = cfg.window_radius

    if full_h is not None and (use_mrf or method not in ("fast",
                                                         "pallas")):
        raise NotImplementedError(
            "row blocks support the fast/pallas WTA paths only")

    cost_at, depths, weights, aux = _build_cost_fn(
        rgb_ref, gray_ref, mask_ref, gray_oth, mask_oth, cam_ref, cam_oth,
        cfg, enable_refraction=enable_refraction,
        enable_distortion=enable_distortion, method=method,
        row0=row0, full_h=full_h)
    mask_ref = aux.mask_ref        # restricted to in-image (global) rows

    if method == "pallas" and cfg.cost != "sad":
        from ..ops.pallas_ncc import pallas_cost_wta
        from ..ops.pallas_warp import pallas_warp_bilinear

        def coords_at(_, d_idx):
            depth = depths[d_idx]
            pts, pvalid = point_from_depth(aux.ray_o, aux.ray_d,
                                           aux.center, aux.normal, depth)
            xy, mvalid = match_points(
                cam_oth, pts, pvalid, cfg.image_scale,
                enable_refraction=enable_refraction,
                enable_distortion=enable_distortion)
            xy = jnp.where(mvalid[..., None], xy, -3e6)
            return (), jnp.moveaxis(xy, -1, 0)        # [2, H, W]

        _, coords = lax.scan(
            coords_at, (), jnp.arange(cfg.num_depth_levels))
        # warped values are only consumed inside the support windows of
        # unmasked pixels — everything else is dead-tile-skippable
        size_d = 2 * radius + 1
        relevant = lax.reduce_window(
            jnp.asarray(mask_ref, dtype), -jnp.inf, lax.max,
            (size_d, size_d), (1, 1), "SAME") > 0.5
        # pad to warp-tile multiples (sentinel coords never sample)
        twh, tww = 8, 32
        hp = -(-h // twh) * twh
        wp = -(-w // tww) * tww
        coords_p = jnp.pad(coords, ((0, 0), (0, 0), (0, hp - h),
                                    (0, wp - w)), constant_values=-3e6)
        interp = jax.default_backend() != "tpu"
        warp_vol, wv_vol, _oob = pallas_warp_bilinear(
            coords_p, gray_oth, mask_oth,
            relevant=jnp.pad(relevant, ((0, hp - h), (0, wp - w))),
            tile_h=twh, tile_w=tww, interpret=interp)
        warp_vol = warp_vol[:, :h, :w]
        wv_vol = wv_vol[:, :h, :w]
        # On non-TPU backends (tests on the virtual CPU mesh) the kernels
        # run under the DMA-emulating TPU interpret mode.
        min_cost, second, best = pallas_cost_wta(
            depths, warp_vol, wv_vol, gray_ref, mask_ref & aux.inb,
            weights, radius=radius, max_color_diff=cfg.max_color_diff,
            bad_ret=cfg.bad_ret, interpret=interp)
        best = jnp.where(min_cost > cfg.second_best_factor * second,
                         jnp.inf, best)
        return jnp.where(mask_ref, best, jnp.nan).astype(dtype)

    if use_mrf:
        # Dense-label MRF over the cost volume (the reference's USE_MRF
        # graph-cut path, twoviewstereo.cpp:335-403) via min-sum BP with
        # truncated-linear smoothness.
        from .mrf import twoview_bp

        def collect(_, d_idx):
            cost, _ = cost_at(d_idx)
            return (), cost

        _, volume = lax.scan(collect, (), jnp.arange(cfg.num_depth_levels))
        labels, _ = twoview_bp(
            volume, smoothness_lambda=cfg.smoothness_lambda,
            smoothness_max=cfg.smoothness_max,
            smoothness_exp=cfg.smoothness_exp)
        best = depths[labels]
        return jnp.where(mask_ref, best, jnp.nan)

    min_cost, second, best = _wta_scan(cost_at, depths, (h, w), dtype)

    # Ambiguity rejection (twoviewstereo.cpp:304-305).
    best = jnp.where(min_cost > cfg.second_best_factor * second,
                     jnp.inf, best)
    # Masked / never-touched pixels stay NaN (twoviewstereo.cpp:269-271).
    best = jnp.where(mask_ref, best, jnp.nan)
    return best


def cross_check_direction(depth_a, depth_b, cam_a: Camera, cam_b: Camera,
                          image_scale, inconsistency_thresh, *,
                          enable_refraction=True, enable_distortion=True,
                          row0=0):
    """One direction of the symmetric cross-check
    (``TwoViewStereo::crossCheck`` twoviewstereo.cpp:596-672).

    Invalidates (-> inf) pixels of ``depth_a`` whose 3D point disagrees with
    the point reconstructed from ``depth_b`` at the reprojected pixel by more
    than ``inconsistency_thresh``.  Pixels whose own plane intersection fails
    are left untouched (reference keeps them).

    ``row0``: global row of depth_a's first row when depth_a is a row block
    (depth_b is always the full other map).
    """
    dtype = depth_a.dtype
    h, w = depth_a.shape
    hb, wb = depth_b.shape

    ray_o, ray_d = pixel_rays(cam_a, h, w, image_scale,
                              enable_refraction=enable_refraction,
                              enable_distortion=enable_distortion,
                              dtype=dtype, row0=row0)
    _, na = principal_ray(cam_a)
    na = na.astype(dtype)
    ca = cam_a.C.astype(dtype)
    _, nb = principal_ray(cam_b)
    nb = nb.astype(dtype)
    cb = cam_b.C.astype(dtype)

    finite = jnp.isfinite(depth_a)
    depth_safe = jnp.where(finite, depth_a, 1.0)

    p1, v1 = point_from_depth(ray_o, ray_d, ca, na, depth_safe)
    xy_full, vproj = project(cam_b, p1, enable_refraction=enable_refraction,
                             enable_distortion=enable_distortion,
                             quartic_iters=30)
    x2 = xy_full[..., 0] * image_scale
    y2 = xy_full[..., 1] * image_scale

    ix = jnp.trunc(x2).astype(jnp.int32)
    iy = jnp.trunc(y2).astype(jnp.int32)
    contains = (x2 >= 0) & (y2 >= 0) & (x2 < wb) & (y2 < hb)
    ixc = jnp.clip(ix, 0, wb - 1)
    iyc = jnp.clip(iy, 0, hb - 1)
    odepth = depth_b[iyc, ixc]
    ofinite = jnp.isfinite(odepth)
    odepth_safe = jnp.where(ofinite, odepth, 1.0)

    # Reference unprojects at the *float* scaled coords + 0.5 pixel center.
    oxy = jnp.stack([(x2 + 0.5) / image_scale,
                     (y2 + 0.5) / image_scale], axis=-1)
    ray2_o, ray2_d = unproject(cam_b, oxy,
                               enable_refraction=enable_refraction,
                               enable_distortion=enable_distortion)
    p2, v2 = point_from_depth(ray2_o, ray2_d, cb, nb, odepth_safe)

    norm = jnp.linalg.norm(p1 - p2, axis=-1)
    consistent = jnp.isfinite(norm) & (norm <= inconsistency_thresh) & v2

    # Failure ladder (twoviewstereo.cpp:617-633): any failed stage after a
    # successful pointFromDepth -> inf; failed pointFromDepth -> keep.
    reject = v1 & ~(vproj & contains & ofinite & consistent)
    return jnp.where(finite & reject, jnp.inf, depth_a)


@functools.partial(
    jax.jit,
    static_argnames=("enable_refraction", "enable_distortion"))
def cross_check_classify(depth_a, depth_b, cam_a: Camera, cam_b: Camera,
                         image_scale, thresh, *,
                         enable_refraction=True, enable_distortion=True):
    """Three-way audit of ``depth_a`` pixels against an independently
    computed ``depth_b``: returns bool maps ``(corroborated, checkable)``.

    checkable — the pixel has a usable depth, its 3D point projects into
    view b onto a pixel where depth_b has a usable value;
    corroborated — checkable AND the two 3D points agree within
    ``thresh`` (the crossCheck metric, twoviewstereo.cpp:596-672, without
    its failure ladder: un-projectable/uncovered pixels are *unverifiable*
    here, not rejected).  Used by bench.py to audit the accuracy of
    survivors the production path keeps but a golden's cross-check drops.
    """
    dtype = depth_a.dtype
    h, w = depth_a.shape
    hb, wb = depth_b.shape
    ray_o, ray_d = pixel_rays(cam_a, h, w, image_scale,
                              enable_refraction=enable_refraction,
                              enable_distortion=enable_distortion,
                              dtype=dtype)
    _, na = principal_ray(cam_a)
    _, nb = principal_ray(cam_b)

    usable = jnp.isfinite(depth_a) & (depth_a >= 0)
    depth_safe = jnp.where(usable, depth_a, 1.0)
    p1, v1 = point_from_depth(ray_o, ray_d, cam_a.C.astype(dtype),
                              na.astype(dtype), depth_safe)
    xy_full, vproj = project(cam_b, p1, enable_refraction=enable_refraction,
                             enable_distortion=enable_distortion,
                             quartic_iters=30)
    x2 = xy_full[..., 0] * image_scale
    y2 = xy_full[..., 1] * image_scale
    contains = (x2 >= 0) & (y2 >= 0) & (x2 < wb) & (y2 < hb)
    ixc = jnp.clip(jnp.trunc(x2).astype(jnp.int32), 0, wb - 1)
    iyc = jnp.clip(jnp.trunc(y2).astype(jnp.int32), 0, hb - 1)
    odepth = depth_b[iyc, ixc]
    ousable = jnp.isfinite(odepth) & (odepth >= 0)
    od_safe = jnp.where(ousable, odepth, 1.0)
    oxy = jnp.stack([(x2 + 0.5) / image_scale,
                     (y2 + 0.5) / image_scale], axis=-1)
    r2o, r2d = unproject(cam_b, oxy,
                         enable_refraction=enable_refraction,
                         enable_distortion=enable_distortion)
    p2, v2 = point_from_depth(r2o, r2d, cam_b.C.astype(dtype),
                              nb.astype(dtype), od_safe)
    norm = jnp.linalg.norm(p1 - p2, axis=-1)
    checkable = usable & v1 & vproj & contains & ousable & v2
    corroborated = checkable & jnp.isfinite(norm) & (norm <= thresh)
    return corroborated, checkable


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "enable_refraction", "enable_distortion"))
def cross_check_pair(depth_l, depth_r, cam_l, cam_r, cfg: TwoViewConfig,
                     **kw):
    """Symmetric cross-check, replicating the reference's sequential order:
    the right pass sees the already-invalidated left map."""
    depth_l2 = cross_check_direction(
        depth_l, depth_r, cam_l, cam_r, cfg.image_scale,
        cfg.inconsistency_thresh, **kw)
    depth_r2 = cross_check_direction(
        depth_r, depth_l2, cam_r, cam_l, cfg.image_scale,
        cfg.inconsistency_thresh, **kw)
    return depth_l2, depth_r2


def compute_depth_maps(rgb_l, mask_l, rgb_r, mask_r, cam_l: Camera,
                       cam_r: Camera, cfg: TwoViewConfig, *,
                       cross_check: bool = True,
                       enable_refraction: bool = True,
                       enable_distortion: bool = True,
                       method: str = "auto",
                       use_mrf: bool = False,
                       dtype=jnp.float32) -> TwoViewResult:
    """Full TwoViewStereo::computeDepthMaps flow (both views + cross-check).

    rgb_*: [H, W, 3] float arrays (0..255) already scaled to working size;
    mask_*: [H, W] bool.  The two stages are separately jitted modules so
    the left and right views share one compiled executable and the
    persistent compilation cache can reuse each stage across entry points.

    use_mrf: optimize each view's dense cost volume with min-sum BP under
    the reference's truncated-linear smoothness instead of WTA (the
    USE_MRF graph-cut path, twoviewstereo.cpp:335-403).
    """
    method = resolve_method(method, cfg)
    rgb_l = jnp.asarray(rgb_l, dtype)
    rgb_r = jnp.asarray(rgb_r, dtype)
    mask_l = jnp.asarray(mask_l, bool)
    mask_r = jnp.asarray(mask_r, bool)
    gray_l = 0.11 * rgb_l[..., 0] + 0.59 * rgb_l[..., 1] + 0.3 * rgb_l[..., 2]
    gray_r = 0.11 * rgb_r[..., 0] + 0.59 * rgb_r[..., 1] + 0.3 * rgb_r[..., 2]

    # host-side camera prep (see stereo/multiview.mvs_depth_maps)
    cam_l = jax.tree.map(lambda x: np.asarray(x).astype(dtype), cam_l)
    cam_r = jax.tree.map(lambda x: np.asarray(x).astype(dtype), cam_r)
    # Host-level demotion: enable_refraction is a *static* flag; when
    # neither camera actually has an interface (Camera::isRefractive_
    # false, camera.cpp:329/339) the refractive projection is the identity
    # but still costs the per-pixel-per-depth interface solve (~35% of the
    # whole sweep measured on bunny).  Cameras are concrete here, so
    # resolve it before tracing.
    enable_refraction = enable_refraction and (
        _host_refractive(cam_l) or _host_refractive(cam_r))
    enable_distortion = enable_distortion and (
        _host_distorted(cam_l) or _host_distorted(cam_r))

    # Stage timers replace the reference's QTime+qDebug prints around each
    # cost-volume pass (twoviewstereo.cpp:260,333,431,501).  Device work is
    # dispatched asynchronously, so per-stage wall clock covers dispatch
    # (plus compile on first call); use runtime.trace.device_trace for a
    # real per-op device profile.
    with trace("twoview/left"):
        depth_l = compute_depth_map_oneview(
            rgb_l, gray_l, mask_l, gray_r, mask_r, cam_l, cam_r, cfg,
            enable_refraction=enable_refraction,
            enable_distortion=enable_distortion, method=method,
            use_mrf=use_mrf)
    with trace("twoview/right"):
        depth_r = compute_depth_map_oneview(
            rgb_r, gray_r, mask_r, gray_l, mask_l, cam_r, cam_l, cfg,
            enable_refraction=enable_refraction,
            enable_distortion=enable_distortion, method=method,
            use_mrf=use_mrf)

    if cross_check:
        with trace("twoview/cross_check"):
            depth_l, depth_r = cross_check_pair(
                depth_l, depth_r, cam_l, cam_r, cfg,
                enable_refraction=enable_refraction,
                enable_distortion=enable_distortion)
    return TwoViewResult(depth_left=depth_l, depth_right=depth_r)
