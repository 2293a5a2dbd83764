"""Refractive-interface calibration — the reference's thesis contribution.

Calibrates, per camera, the refractive-interface normal (parametrized as the
pixel (px, py) where the normal pierces the image) and distance, plus one
shared refractive index, by LM on the image-space-scaled ray-ray mismatch of
feature correspondences (stereo/refractioncalibration.cpp).

Model layout (refractioncalibration.cpp:234-251):
  model[0]          shared refractive index
  model[3v + 1]     px for view v      (normal = K^-1 (px, py, 1), normalized)
  model[3v + 2]     py for view v
  model[3v + 3]     interface distance for view v

Error metric (``diff`` refractioncalibration.cpp:175-199): distance between
the closest points of the two unprojected (refracted) rays, scaled into
approximate image-space pixels by each view's focal length over the local
depth of the midpoint.

The residual function is pure JAX over all correspondences at once; LM uses
autodiff Jacobians by default (the reference uses central finite differences
with per-parameter step sizes, refractioncalibration.cpp:201-232 — available
via ``use_fd=True`` for parity runs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import RefractionConfig
from ..geometry.camera import Camera, unproject
from ..geometry.rays import closest_points
from ..optim.lm import lm_optimize, LMResult
from ..runtime.trace import metric, trace

_EPS = 1e-10


def _stack_cams(cams: Sequence[Camera]) -> Camera:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def _cam_with_model(cams: Camera, v, model):
    """Camera v with the interface parameters taken from the model vector."""
    cam = jax.tree.map(lambda x: x[v], cams)
    px = model[3 * v + 1]
    py = model[3 * v + 2]
    d = model[3 * v + 3]
    n = cam.Kinv @ jnp.stack([px, py, jnp.ones_like(px)])
    n = n / jnp.maximum(jnp.linalg.norm(n), _EPS)
    return cam._replace(plane_normal=n, plane_dist=d, refr_index=model[0])


def make_residual_fn(cams: Sequence[Camera], p1, p2, vi1, vi2):
    """Residual function over all correspondences.

    p1/p2: [N, 2] full-resolution pixel coords; vi1/vi2: [N] view indices.
    Returns f(model [3V+1]) -> [N] residuals.
    """
    stacked = _stack_cams(cams)
    p1 = jnp.asarray(p1, jnp.float64)
    p2 = jnp.asarray(p2, jnp.float64)
    vi1 = jnp.asarray(vi1, jnp.int32)
    vi2 = jnp.asarray(vi2, jnp.int32)

    def one(model, pa, pb, va, vb):
        cam1 = _cam_with_model(stacked, va, model)
        cam2 = _cam_with_model(stacked, vb, model)
        o1, d1 = unproject(cam1, pa)
        o2, d2 = unproject(cam2, pb)
        q1, q2 = closest_points(o1, d1, o2, d2)
        dist = jnp.linalg.norm(q1 - q2)

        mid = 0.5 * (q1 + q2)
        mid1 = cam1.R @ mid + cam1.t
        mid2 = cam2.R @ mid + cam2.t
        v1 = (0.5 * cam1.K[0, 0] * dist) / mid1[2]
        v2 = (0.5 * cam2.K[0, 0] * dist) / mid2[2]
        return v1 + v2

    def residuals(model):
        return jax.vmap(one, in_axes=(None, 0, 0, 0, 0))(
            model, p1, p2, vi1, vi2)

    return residuals


def gather_correspondences(proj, view_ids: Sequence[str],
                           image_set_ids: Sequence[str]):
    """Flatten all correspondences of the selected image sets over all view
    pairs (refractioncalibration.cpp:355-381).

    Returns (p1 [N,2], p2 [N,2], vi1 [N], vi2 [N]).
    """
    p1s, p2s, v1s, v2s = [], [], [], []
    for set_id in image_set_ids:
        for a in range(len(view_ids)):
            for b in range(a + 1, len(view_ids)):
                pairs, swapped = proj.correspondences_for(
                    set_id, view_ids[a], set_id, view_ids[b])
                feats_a = proj.features.get((set_id, view_ids[a]), [])
                feats_b = proj.features.get((set_id, view_ids[b]), [])
                for (i1, i2) in pairs:
                    if swapped:
                        i1, i2 = i2, i1
                    if i1 >= len(feats_a) or i2 >= len(feats_b):
                        continue
                    fa, fb = feats_a[i1], feats_b[i2]
                    p1s.append((fa.x, fa.y))
                    p2s.append((fb.x, fb.y))
                    v1s.append(a)
                    v2s.append(b)
    return (np.array(p1s, np.float64).reshape(-1, 2),
            np.array(p2s, np.float64).reshape(-1, 2),
            np.array(v1s, np.int32), np.array(v2s, np.int32))


def default_model(cams: Sequence[Camera], refr_index: float = 1.333):
    """Initial model: current interface if present, else principal point,
    unit distance."""
    model = [None] * (3 * len(cams) + 1)
    any_n = None
    for v, cam in enumerate(cams):
        K = np.asarray(cam.K)
        n = np.asarray(cam.plane_normal)
        d = float(cam.plane_dist)
        idx = float(cam.refr_index)
        if abs(idx - 1.0) > _EPS and abs(d) > _EPS:
            p = K @ n
            p = p / p[2]
            model[3 * v + 1] = p[0]
            model[3 * v + 2] = p[1]
            model[3 * v + 3] = d
            any_n = idx
        else:
            model[3 * v + 1] = K[0, 2]
            model[3 * v + 2] = K[1, 2]
            model[3 * v + 3] = 1.0
    model[0] = any_n if any_n is not None else refr_index
    return np.array(model, np.float64)


@dataclass
class RefractionCalibrationResult:
    model: np.ndarray
    chi2_before: float
    chi2_after: float
    iterations: int
    ok: bool

    def plane_params(self, v: int) -> Tuple[float, float, float]:
        return (float(self.model[3 * v + 1]), float(self.model[3 * v + 2]),
                float(self.model[3 * v + 3]))

    @property
    def refractive_index(self) -> float:
        return float(self.model[0])


def calibrate(cams: Sequence[Camera], p1, p2, vi1, vi2,
              model0: Optional[np.ndarray] = None,
              fixed: Optional[np.ndarray] = None,
              cfg: RefractionConfig = RefractionConfig(),
              use_fd: bool = False) -> RefractionCalibrationResult:
    """RefractionCalibration::calibrate (refractioncalibration.cpp:289-404).

    ``fixed`` marks frozen parameters (e.g. all three of a non-refractive
    view, as StereoWidget does at stereowidget.cpp:573-598).
    """
    n_views = len(cams)
    if model0 is None:
        model0 = default_model(cams)
    assert model0.size == 3 * n_views + 1

    residual_fn = make_residual_fn(cams, p1, p2, vi1, vi2)

    def validate(model):
        # Reference quirk preserved: rejects when model[3v+2] (the *py*
        # normal parameter, not the distance) drops below 1e-4
        # (refractioncalibration.cpp:234-237).
        for v in range(n_views):
            if model[3 * v + 2] < 1e-4:
                return False
        return True

    fd_steps = None
    if use_fd:
        # per-parameter central-difference steps
        # (refractioncalibration.cpp:211-223; note the dist step is one-sided)
        fd_steps = np.zeros((model0.size, 2))
        fd_steps[0] = (cfg.step_index, cfg.step_index)
        for v in range(n_views):
            fd_steps[3 * v + 1] = (cfg.step_px, cfg.step_px)
            fd_steps[3 * v + 2] = (cfg.step_py, cfg.step_py)
            fd_steps[3 * v + 3] = (0.0, cfg.step_dist)

    with trace("refraction/lm"):
        res: LMResult = lm_optimize(
            residual_fn, model0, fixed=fixed,
            max_iterations=cfg.max_iterations, epsilon=cfg.epsilon,
            validate_fn=validate, fd_steps=fd_steps)

    # structured replacement for the reference's chi^2 before/after prints
    # (refractioncalibration.cpp:387-396)
    metric("refraction/chi2_before", res.initial_chi2)
    metric("refraction/chi2_after", res.chi2)

    ok = bool(np.all(np.isfinite(res.model)))
    return RefractionCalibrationResult(
        model=res.model, chi2_before=res.initial_chi2, chi2_after=res.chi2,
        iterations=res.iterations, ok=ok)


def total_error(cams: Sequence[Camera], model, p1, p2, vi1, vi2):
    """RefractionCalibration::totalError (refractioncalibration.cpp:408-451).

    Returns (total, average) of squared residuals.
    """
    residual_fn = make_residual_fn(cams, p1, p2, vi1, vi2)
    r = np.asarray(jax.jit(residual_fn)(jnp.asarray(model)))
    total = float(np.sum(r * r))
    return total, total / max(len(r), 1)


def correspondence_error(cams: Sequence[Camera], model, pa, pb, va, vb):
    """Per-correspondence error for interactive display
    (RefractionCalibration::error, refractioncalibration.cpp:455-467)."""
    residual_fn = make_residual_fn(
        cams, np.asarray(pa).reshape(1, 2), np.asarray(pb).reshape(1, 2),
        np.array([va]), np.array([vb]))
    return float(np.abs(np.asarray(residual_fn(jnp.asarray(model))))[0])
