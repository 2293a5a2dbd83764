"""ctypes bindings for the native runtime library."""

from __future__ import annotations

import ctypes

import numpy as np

from .build import load_library


def _camera_params(cam) -> np.ndarray:
    """Pack a geometry.Camera into the 43-double native layout."""
    return np.concatenate([
        np.asarray(cam.K, np.float64).ravel(),
        np.asarray(cam.Kinv, np.float64).ravel(),
        np.asarray(cam.R, np.float64).ravel(),
        np.asarray(cam.t, np.float64).ravel(),
        np.asarray(cam.C, np.float64).ravel(),
        np.asarray(cam.dist, np.float64).ravel(),
        np.asarray(cam.plane_normal, np.float64).ravel(),
        np.atleast_1d(np.asarray(cam.plane_dist, np.float64)),
        np.atleast_1d(np.asarray(cam.refr_index, np.float64)),
    ])


def twoview_depth_map_native(rgb_ref, mask_ref, rgb_oth, mask_oth,
                             cam_ref, cam_oth, cfg) -> np.ndarray:
    """Reference-style CPU depth map (OpenMP rows) — the bench baseline."""
    lib = load_library()
    fn = lib.twoview_depth_map
    fn.restype = None

    rgb_ref = np.ascontiguousarray(rgb_ref, np.float32)
    rgb_oth = np.ascontiguousarray(rgb_oth, np.float32)
    mask_ref = np.ascontiguousarray(mask_ref, np.uint8)
    mask_oth = np.ascontiguousarray(mask_oth, np.uint8)
    h, w = rgb_ref.shape[:2]
    out = np.empty((h, w), np.float64)

    p_ref = _camera_params(cam_ref)
    p_oth = _camera_params(cam_oth)

    c_d = ctypes.c_double
    c_i = ctypes.c_int
    fn(rgb_ref.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       mask_ref.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       rgb_oth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       mask_oth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       c_i(h), c_i(w),
       p_ref.ctypes.data_as(ctypes.POINTER(c_d)),
       p_oth.ctypes.data_as(ctypes.POINTER(c_d)),
       c_d(cfg.min_depth), c_d(cfg.max_depth), c_i(cfg.num_depth_levels),
       c_d(cfg.image_scale), c_i(cfg.window_radius),
       c_d(cfg.weights.geodesic_sigma), c_i(cfg.weights.geodesic_iters),
       c_d(cfg.max_color_diff), c_d(cfg.bad_ret),
       c_d(cfg.second_best_factor),
       out.ctypes.data_as(ctypes.POINTER(c_d)))
    return out


def geodesic_weights_native(rgb, radius: int, sigma: float = 50.0,
                            iters: int = 3) -> np.ndarray:
    """Whole-image f64 geodesic support weights — the authoritative
    oracle for the TPU weight kernels (geodesicweight.cpp:59-135
    semantics).  rgb [H, W, 3] -> weights [S, S, H, W] f64."""
    lib = load_library()
    fn = lib.geodesic_weights_image
    fn.restype = None
    rgb = np.ascontiguousarray(rgb, np.float32)
    h, w = rgb.shape[:2]
    size = 2 * radius + 1
    out = np.empty((size * size, h, w), np.float64)
    fn(rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       ctypes.c_int(h), ctypes.c_int(w), ctypes.c_int(radius),
       ctypes.c_double(sigma), ctypes.c_int(iters),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out.reshape(size, size, h, w)


def native_num_threads() -> int:
    lib = load_library()
    lib.oracle_num_threads.restype = ctypes.c_int
    return int(lib.oracle_num_threads())


def mvs_depth_maps_native(rgbs, masks, cams, neighbours, cfg,
                          cross_check: bool = True) -> np.ndarray:
    """Reference-style CPU MVS depth maps (Campbell 2009; OpenMP rows) —
    the MVS bench baseline + golden generator.

    rgbs [V, H, W, 3]; masks [V, H, W]; cams: list of geometry.Camera;
    neighbours: per-view index lists (stereo.multiview.select_neighbours).
    Returns depths [V, H, W] (INF = masked, -1 = no peak, NaN = failed
    cross-check — the reference's sentinels).
    """
    lib = load_library()
    fn = lib.mvs_depth_maps_native
    fn.restype = None

    rgbs = np.ascontiguousarray(rgbs, np.float32)
    masks = np.ascontiguousarray(masks, np.uint8)
    v, h, w = rgbs.shape[:3]
    params = np.ascontiguousarray(
        np.stack([_camera_params(c) for c in cams]))
    max_nbr = max((len(n) for n in neighbours), default=1)
    nbr = np.full((v, max_nbr), -1, np.int32)
    for i, n in enumerate(neighbours):
        nbr[i, :len(n)] = n
    out = np.empty((v, h, w), np.float64)

    c_d = ctypes.c_double
    c_i = ctypes.c_int
    fn(rgbs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       c_i(v), c_i(h), c_i(w),
       params.ctypes.data_as(ctypes.POINTER(c_d)),
       nbr.ctypes.data_as(ctypes.POINTER(c_i)), c_i(max_nbr),
       c_d(cfg.min_depth), c_d(cfg.max_depth), c_i(cfg.num_depth_levels),
       c_d(cfg.image_scale), c_i(cfg.window_radius),
       c_d(cfg.weights.geodesic_sigma), c_i(cfg.weights.geodesic_iters),
       c_d(cfg.ncc_threshold), c_d(cfg.cross_check_threshold),
       c_i(1 if cross_check else 0),
       out.ctypes.data_as(ctypes.POINTER(c_d)))
    return out
