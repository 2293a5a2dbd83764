"""Levenberg-Marquardt with the reference's control-flow semantics.

Re-implements ``util/lm.cpp:61-152`` — damping schedule (x10 on worse, x0.1
on better), model rejection via a validate callback (``Function::update``
returning false), NaN guards, fixed-parameter masks, and the terminate-after-
5-small-improvements rule — but with **autodiff Jacobians** (jax.jacfwd)
instead of the reference's central finite differences
(refractioncalibration.cpp:201-232).  A finite-difference mode with
per-parameter step sizes is kept for bit-parity experiments.

The normal equations are restricted to the free parameters (the reference
zeroes fixed rows/columns and LU-solves the singular system,
util/lm.cpp:86-103; solving the reduced system is the well-posed equivalent).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class LMResult:
    model: np.ndarray
    chi2: float
    initial_chi2: float
    iterations: int
    converged: bool


def lm_optimize(
        residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
        model0: np.ndarray,
        *,
        fixed: Optional[np.ndarray] = None,
        max_iterations: int = 100,
        epsilon: float = 1.0,
        validate_fn: Optional[Callable[[np.ndarray], bool]] = None,
        fd_steps: Optional[np.ndarray] = None,
) -> LMResult:
    """Minimize ``sum(residual_fn(model)**2)``.

    residual_fn: jittable, model [P] -> residuals [N].
    fixed: bool [P], True = frozen (LevenbergMarquardt::FixedParams).
    validate_fn: host-side model rejection (Function::update semantics); a
      rejected model bumps lambda and keeps the previous model
      (util/lm.cpp:123-128).
    fd_steps: optional [P] central-difference half-steps; when given the
      Jacobian uses finite differences exactly like
      refractioncalibration.cpp:201-232 (step down may differ from step up —
      pass (step_lo, step_hi) via a [P, 2] array for asymmetric steps).
    """
    model = np.asarray(model0, np.float64).copy()
    nparams = model.size
    if fixed is None:
        fixed = np.zeros(nparams, bool)
    fixed = np.asarray(fixed, bool)
    free_idx = np.where(~fixed)[0]

    res_jit = jax.jit(residual_fn)

    if fd_steps is None:
        jac_jit = jax.jit(jax.jacfwd(residual_fn))

        def jacobian(m):
            return np.asarray(jac_jit(jnp.asarray(m)))
    else:
        steps = np.asarray(fd_steps, np.float64)
        if steps.ndim == 1:
            steps = np.stack([steps, steps], axis=-1)

        def jacobian(m):
            cols = np.zeros((int(np.asarray(res_jit(jnp.asarray(m))).size),
                             nparams))
            for p in free_idx:
                m1 = m.copy()
                m2 = m.copy()
                m1[p] -= steps[p, 0]
                m2[p] += steps[p, 1]
                r1 = np.asarray(res_jit(jnp.asarray(m1)))
                r2 = np.asarray(res_jit(jnp.asarray(m2)))
                cols[:, p] = (r2 - r1) / (m2[p] - m1[p])
            return cols

    def chi2(m):
        r = np.asarray(res_jit(jnp.asarray(m)))
        return float(np.sum(r * r))

    if validate_fn is not None and not validate_fn(model):
        return LMResult(model, np.inf, np.inf, 0, False)

    e0 = chi2(model)
    initial = e0
    lam = 1.0

    it = 0
    term = 0
    while it < max_iterations and term < 5:
        it += 1

        r = np.asarray(res_jit(jnp.asarray(model)))
        J = jacobian(model)
        Jf = J[:, free_idx]
        H = Jf.T @ Jf
        g = Jf.T @ r

        H = H.copy()
        H[np.diag_indices_from(H)] *= (1.0 + lam)

        try:
            d = np.linalg.solve(H, -g)
        except np.linalg.LinAlgError:
            term += 1
            continue

        if not np.all(np.isfinite(d)):
            lam *= 10.0
            term += 1
            continue

        new_model = model.copy()
        new_model[free_idx] += d

        if validate_fn is not None and not validate_fn(new_model):
            lam *= 10.0
            term += 1
            continue

        e1 = chi2(new_model)
        if abs(e1 - e0) > epsilon:
            term = 0
        else:
            term += 1

        if e0 - e1 < 0 or np.isnan(e1):
            lam *= 10.0
        else:
            lam *= 0.1
            e0 = e1
            model = new_model

    return LMResult(model, e0, initial, it, term >= 5)
