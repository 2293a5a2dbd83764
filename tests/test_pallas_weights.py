"""Pallas geodesic-weights kernel == XLA formulation (interpret mode).

Small shapes/radius only — interpret mode emulates every vector op, and
the unrolled sweep is large.  The full-size kernel is exercised on real
TPU by bench.py (whose quality gate anchors the end-to-end output to the
native golden)."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereoreconstruction_tpu.ops.weights import geodesic_weights
from stereoreconstruction_tpu.ops.pallas_weights import (
    pallas_geodesic_weights)


@pytest.mark.parametrize("shape,radius,tile_h", [
    ((16, 20, 3), 2, 8),
    ((24, 130, 3), 2, 8),   # non-128 width, lane padding + wrap masking
])
def test_matches_xla_fast_weights(rng, shape, radius, tile_h):
    rgb = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    want = np.asarray(geodesic_weights(rgb, radius, exact=False))
    got = np.asarray(pallas_geodesic_weights(
        rgb, radius, tile_h=tile_h, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)
