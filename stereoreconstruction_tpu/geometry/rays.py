"""Batched ray primitives.

Re-implements the semantics of the reference's ``util/ray.{hpp,cpp}``
(``Ray3d::closestPoints`` ray.cpp:53-74, ``intersect(ray, plane)``
ray.cpp:78-88, ``refract(R, P, n, Rout)`` ray.cpp:92-106, ``midpoint``
ray.cpp:110-114) as pure, vmappable JAX functions over ``[..., 3]`` arrays.

A ray is an ``(origin, direction)`` pair.  The reference's ``Ray3d``
constructor always normalizes the direction; callers here are expected to pass
normalized directions (``unproject`` and ``refract_ray`` return normalized
directions).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-10


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def closest_points(o1, d1, o2, d2):
    """Closest points between two rays (each ``[..., 3]``).

    Matches ray.cpp:53-74 including the one-sided clamp: each closest point is
    moved along its ray only when the line parameter is positive, otherwise the
    ray's source is used.

    Returns ``(p1, p2)`` with shape ``[..., 3]``.
    """
    w0 = o1 - o2
    a = _dot(d1, d1)
    b = _dot(d1, d2)
    c = _dot(d2, d2)
    d = _dot(d1, w0)
    e = _dot(d2, w0)

    den = 1.0 / (a * c - b * b)
    tl = (b * e - c * d) * den
    tr = (a * e - b * d) * den

    p1 = o1 + jnp.where(tl > 0, tl, 0.0)[..., None] * d1
    p2 = o2 + jnp.where(tr > 0, tr, 0.0)[..., None] * d2
    return p1, p2


def ray_ray_distance(o1, d1, o2, d2):
    """Distance between the closest points of two rays (ray.cpp:45-49)."""
    p1, p2 = closest_points(o1, d1, o2, d2)
    return jnp.linalg.norm(p1 - p2, axis=-1)


def ray_midpoint(o1, d1, o2, d2):
    """Midpoint of the closest points of two rays (ray.cpp:110-114)."""
    p1, p2 = closest_points(o1, d1, o2, d2)
    return 0.5 * (p1 + p2)


def intersect_plane(o, d, normal, dist):
    """Ray/plane intersection (ray.cpp:78-88).

    The plane is ``{x : normal . x = dist}`` with ``x0 = dist * normal``
    (see util/plane.hpp:26-47; ``normal`` must be unit length).

    Returns ``(point, valid)`` where ``valid`` is False when the ray is
    parallel to the plane (|n.d| < 1e-10) or the hit parameter t < 1e-10.
    On invalid, ``point`` is the (unusable) extrapolated value.
    """
    x0 = dist[..., None] * normal
    nd = _dot(normal, d)
    nd_safe = jnp.where(jnp.abs(nd) < _EPS, 1.0, nd)
    t = _dot(normal, x0 - o) / nd_safe
    valid = (jnp.abs(nd) >= _EPS) & (t >= _EPS)
    p = o + t[..., None] * d
    return p, valid


def refract_ray(o, d, normal, dist, n):
    """Snell-refract a ray through a plane (ray.cpp:92-106).

    ``n`` is the refractive index ratio.  Returns ``(o_out, d_out, valid)``;
    when refraction is impossible (no plane hit, or total internal reflection)
    the input ray is returned unchanged with ``valid = False`` — this mirrors
    ``Camera::unproject`` (camera.cpp:455-456) where a failed ``refract``
    leaves the ray untouched.

    ``d_out`` is normalized (the reference's Ray3d ctor normalizes).
    """
    p, hit = intersect_plane(o, d, normal, dist)

    cos_i = -_dot(normal, d)
    cos_t2 = 1.0 - (1.0 - cos_i * cos_i) / (n * n)
    ok = hit & (cos_t2 > 0.0)

    sign = jnp.where(cos_i > 0.0, -1.0, 1.0)
    scale = cos_i + n * sign * jnp.sqrt(jnp.maximum(cos_t2, 0.0))
    d_new = d + scale[..., None] * normal
    d_new = d_new / jnp.maximum(
        jnp.linalg.norm(d_new, axis=-1, keepdims=True), _EPS
    )

    o_out = jnp.where(ok[..., None], p, o)
    d_out = jnp.where(ok[..., None], d_new, d)
    return o_out, d_out, ok
