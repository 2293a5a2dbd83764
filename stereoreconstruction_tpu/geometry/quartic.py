"""Vectorized solver for the refractive-projection quartic.

The reference projects a local-frame point through a flat refractive interface
by solving a quartic with GSL's complex companion-matrix solver and then
picking the root whose radial coordinate is sign-consistent with the point
(``projectRefraction`` camera.cpp:95-138; root selection camera.cpp:119-134).

TPU-native redesign: the selection rule at camera.cpp:119-134 is equivalent to
requiring the root to lie in ``[0, r]`` where ``r`` is the radial distance of
the point from the interface axis (both "py and y share a sign" and
"|py| <= |y|" reduce to ``0 <= root <= r`` since ``py = root * dir_y`` and
``y = r * dir_y``).  The quartic

    f(ri) = (n^2-1) ri^4 - 2 r (n^2-1) ri^3
            + (r^2 (n^2-1) + d^2 n^2 - (z-d)^2) ri^2
            - 2 d^2 n^2 r ri + d^2 n^2 r^2

(coefficients from camera.cpp:110-116) satisfies

    f(0) = d^2 n^2 r^2 >= 0      and      f(r) = -r^2 (z-d)^2 <= 0,

so a real root is *always* bracketed in ``[0, r]``.  Bisection on that bracket
is branch-free, runs identically for every (pixel, depth) lane, and needs no
complex arithmetic — a much better fit for the VPU than a general quartic
solver.  60 iterations reach f64 machine precision; 30 suffice for f32.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def refraction_radius(r, z, d, n, *, iters: int = 60):
    """Solve for the interface-plane radius ``ri`` of the refraction point.

    Args:
      r: radial distance of the point from the interface axis, ``[...]``.
      z: axial distance of the point (|projection onto the plane normal|).
      d: interface distance from the camera center.
      n: refractive index ratio.
      iters: bisection iterations (60 ~ f64 exact, 30 ~ f32 exact).

    Returns:
      ``ri`` with the same shape as ``r``; the unique root in ``[0, r]``.
    """
    nn = n * n
    rr = r * r
    dd = d * d

    c4 = nn - 1.0
    c3 = -2.0 * r * (nn - 1.0)
    c2 = rr * (nn - 1.0) + dd * nn - (z - d) * (z - d)
    c1 = -2.0 * dd * nn * r
    c0 = dd * nn * rr

    def f(x):
        return (((c4 * x + c3) * x + c2) * x + c1) * x + c0

    lo = jnp.zeros_like(r)
    hi = r

    # f(lo) >= 0, f(hi) <= 0: keep the sign invariant while bisecting.
    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        fm = f(mid)
        go_right = fm >= 0.0
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid)
        return lo, hi

    lo, hi = lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)
