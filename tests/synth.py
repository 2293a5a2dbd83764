"""Synthetic photoconsistent scene renderer for parity/e2e tests.

Renders a textured world plane through the package's own camera model
(oracle-validated in test_geometry.py), so every view of the scene is
*exactly* photoconsistent: the texture is a smooth procedural function of
the world point, evaluated analytically at each pixel's ray/plane
intersection — no resampling error, no occlusion.  This gives stereo tests
real structure to match (unlike independent random images) plus an exact
ground-truth depth map per view.
"""

import numpy as np
import jax.numpy as jnp

from stereoreconstruction_tpu.geometry import make_camera
from stereoreconstruction_tpu.geometry.camera import principal_ray
from stereoreconstruction_tpu.stereo.depthsweep import pixel_rays
from stereoreconstruction_tpu.geometry.rays import intersect_plane


def procedural_texture(xy, seed=0, n_waves=24, amplitude=55.0,
                       n_blobs=0, blob_region=30.0):
    """Smooth multi-frequency RGB texture of world coordinates.

    xy: [..., 2] world-plane coordinates.  Returns [..., 3] in 0..255.
    Deterministic in ``seed``; infinite extent (no out-of-bounds).

    ``n_blobs`` adds isotropic Gaussian blobs (centers uniform in
    [-blob_region, blob_region]^2) — ideal SURF/Hessian features for
    detect→match fixtures, still analytic so views stay exactly
    photoconsistent."""
    rng = np.random.default_rng(seed)
    freqs = rng.uniform(0.05, 1.2, size=(3, n_waves, 2))
    phases = rng.uniform(0, 2 * np.pi, size=(3, n_waves))
    amps = rng.uniform(0.3, 1.0, size=(3, n_waves))
    amps /= amps.sum(axis=1, keepdims=True)

    x = np.asarray(xy[..., 0])[..., None]
    y = np.asarray(xy[..., 1])[..., None]
    chans = []
    for c in range(3):
        v = np.sum(amps[c] * np.sin(freqs[c, :, 0] * x
                                    + freqs[c, :, 1] * y + phases[c]),
                   axis=-1)
        chans.append(127.5 + amplitude * v / np.abs(amps[c]).max() * 0.5)
    tex = np.stack(chans, axis=-1)

    if n_blobs:
        centers = rng.uniform(-blob_region, blob_region, (n_blobs, 2))
        sig = rng.uniform(0.5, 1.8, n_blobs)
        amp = rng.uniform(60.0, 110.0, n_blobs) * rng.choice(
            [-1.0, 1.0], n_blobs)
        cmix = rng.uniform(0.5, 1.0, (n_blobs, 3))
        d2 = ((np.asarray(xy[..., 0])[..., None] - centers[:, 0]) ** 2
              + (np.asarray(xy[..., 1])[..., None] - centers[:, 1]) ** 2)
        g = np.exp(-d2 / (2.0 * sig ** 2))          # [..., n_blobs]
        tex = tex + np.einsum("...b,bc->...c", g, amp[:, None] * cmix)

    return np.clip(tex, 0.0, 255.0)


def checkerboard_texture(xy, *, cols=8, rows=6, cell=2.0,
                         center=(0.0, 0.0), sharp=3.0):
    """Finite smooth checkerboard of world coordinates — the analytic
    analog of the reference's printed calibration board (cols x rows
    INNER corners).  tanh-smoothed edges keep it band-limited (exact
    photoconsistency, subpixel-refinable saddles); outside the board the
    texture is flat mid-gray.  Inner corner k (row-major) sits at world
    ``center + cell * (j - cols/2 + ..., i - rows/2 + ...)`` — see
    :func:`checkerboard_corners_world`."""
    x = (np.asarray(xy[..., 0]) - center[0]) / cell + (cols + 1) / 2.0
    y = (np.asarray(xy[..., 1]) - center[1]) / cell + (rows + 1) / 2.0
    checker = (np.tanh(sharp * np.sin(np.pi * x))
               * np.tanh(sharp * np.sin(np.pi * y)))
    # smooth box window: 1 inside the (cols+1) x (rows+1) cell board
    win = (1.0 / (1.0 + np.exp(-6.0 * x))
           * 1.0 / (1.0 + np.exp(-6.0 * (cols + 1 - x)))
           * 1.0 / (1.0 + np.exp(-6.0 * y))
           * 1.0 / (1.0 + np.exp(-6.0 * (rows + 1 - y))))
    v = 127.5 + 110.0 * checker * win
    return np.repeat(v[..., None], 3, axis=-1)


def checkerboard_corners_world(*, cols=8, rows=6, cell=2.0,
                               center=(0.0, 0.0), plane_z=60.0):
    """World positions of the board's inner corners, row-major like
    find_chessboard_corners output: [rows*cols, 3]."""
    pts = []
    for i in range(rows):
        for j in range(cols):
            pts.append([center[0] + cell * (j + 1 - (cols + 1) / 2.0),
                        center[1] + cell * (i + 1 - (rows + 1) / 2.0),
                        plane_z])
    return np.asarray(pts)


def render_plane_view(cam, h, w, plane_normal, plane_dist, *,
                      image_scale=1.0, seed=0, n_blobs=0, blob_region=30.0,
                      texture_fn=None,
                      enable_refraction=True, enable_distortion=True):
    """Render one view of the textured world plane n.x = d.

    Returns (rgb [h, w, 3] float 0..255, true_depth [h, w]) where
    ``true_depth`` is the engine's depth convention: distance of the surface
    point along the camera's principal-ray direction (pointFromDepth
    semantics, twoviewstereo.cpp:987-995).

    ``texture_fn(xy [..., 2]) -> rgb`` overrides the default procedural
    texture (e.g. :func:`checkerboard_texture`)."""
    ray_o, ray_d = pixel_rays(cam, h, w, image_scale,
                              enable_refraction=enable_refraction,
                              enable_distortion=enable_distortion,
                              dtype=jnp.float64)
    n = jnp.asarray(plane_normal, jnp.float64)
    n = n / jnp.linalg.norm(n)
    pts, valid = intersect_plane(ray_o, ray_d, n, jnp.float64(plane_dist))
    pts = np.asarray(pts)
    if texture_fn is not None:
        rgb = texture_fn(pts[..., :2])
    else:
        rgb = procedural_texture(pts[..., :2], seed=seed, n_blobs=n_blobs,
                                 blob_region=blob_region)

    _, pr = principal_ray(cam)
    depth = (pts - np.asarray(cam.C)) @ np.asarray(pr)
    depth = np.where(np.asarray(valid), depth, np.nan)
    return rgb, depth


def converging_rig(n_cams=2, *, focal=300.0, h=64, w=80, baseline=12.0,
                   target_z=60.0, refractive=False, refr_index=1.333,
                   plane_dist=2.0, interface_tilt=0.0):
    """Cameras on a horizontal arc looking at (0, 0, target_z).

    Returns a list of Camera.  With ``refractive``, each camera gets a flat
    port (interface plane) at ``plane_dist`` in front of it, normal along
    its optical axis (the underwater-housing setup the thesis calibrates,
    refractioncalibration.cpp:234-251); ``interface_tilt`` (radians) tilts
    each port's normal away from the optical axis so the normal's image
    piercing point differs from the principal point."""
    K = np.array([[focal, 0.0, w / 2.0],
                  [0.0, focal, h / 2.0],
                  [0.0, 0.0, 1.0]])
    cams = []
    for i in range(n_cams):
        cx = (i - (n_cams - 1) / 2.0) * baseline
        center = np.array([cx, 0.0, 0.0])
        # look-at rotation: z-axis toward the target
        z = np.array([0.0, 0.0, target_z]) - center
        z = z / np.linalg.norm(z)
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])               # world->cam rows
        t = -R @ center
        kw = {}
        if refractive:
            # Interface plane in the camera's *local* frame (the Camera
            # convention): normal = +z (optical axis), optionally tilted
            # toward local +x, at plane_dist along the normal.
            ct, st = np.cos(interface_tilt), np.sin(interface_tilt)
            kw = dict(plane_normal=np.array([st, 0.0, ct]),
                      plane_dist=plane_dist, refr_index=refr_index)
        cams.append(make_camera(K, R, t, **kw))
    return cams


def render_scene(cams, h, w, *, plane_normal=(0.0, 0.0, 1.0),
                 plane_dist=60.0, image_scale=1.0, seed=0, n_blobs=0,
                 blob_region=30.0, texture_fn=None,
                 enable_refraction=True):
    """Render every camera's view of the same textured plane.

    Returns (rgbs [V, h, w, 3], masks [V, h, w] all-true,
    true_depths [V, h, w])."""
    rgbs, depths = [], []
    for cam in cams:
        rgb, dep = render_plane_view(
            cam, h, w, plane_normal, plane_dist, image_scale=image_scale,
            seed=seed, n_blobs=n_blobs, blob_region=blob_region,
            texture_fn=texture_fn,
            enable_refraction=enable_refraction)
        rgbs.append(rgb)
        depths.append(dep)
    masks = np.ones((len(cams), h, w), bool)
    return np.stack(rgbs), masks, np.stack(depths)
