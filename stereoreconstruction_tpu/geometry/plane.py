"""Plane representation matching the reference's ``util/plane.hpp:26-47``.

A plane is ``(unit normal n, scalar distance d)`` with ``x0() = d * n``.
Stored as a small NamedTuple of arrays so it can live inside jitted pytrees.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Plane(NamedTuple):
    normal: jnp.ndarray  # [..., 3], unit length
    dist: jnp.ndarray    # [...]

    @property
    def x0(self):
        return self.dist[..., None] * self.normal


def make_plane(normal, dist):
    """Build a plane, normalizing the normal (Plane3d ctor semantics)."""
    normal = jnp.asarray(normal, dtype=jnp.float64)
    dist = jnp.asarray(dist, dtype=jnp.float64)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-300
    )
    return Plane(normal=normal, dist=dist)
