"""Warp ops: matmul-based bilinear warps must match direct bilinear
sampling; fast cost path sanity."""

import numpy as np
import jax.numpy as jnp

from stereoreconstruction_tpu.ops.warp import (
    warp_bilinear_matmul, warp_rows_banded)
from stereoreconstruction_tpu.ops.sampling import bilinear_sample


def test_full_matmul_warp_matches_bilinear(rng):
    img = jnp.asarray(rng.uniform(0, 255, (48, 64)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(-5, 68, (48, 64)).astype(np.float32))
    y2 = jnp.asarray(rng.uniform(-5, 52, (48, 64)).astype(np.float32))
    ref, vref = bilinear_sample(img, x2, y2)
    got, v = warp_bilinear_matmul(img, x2, y2, compute_dtype=jnp.float32)
    assert bool(jnp.all(v == vref))
    np.testing.assert_allclose(np.where(np.asarray(vref),
                                        np.asarray(got), 0.0),
                               np.where(np.asarray(vref),
                                        np.asarray(ref), 0.0), atol=1e-3)


def test_banded_warp_matches_bilinear(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 96)).astype(np.float32))
    # smooth map (epipolar-like): moderate vertical variation
    ys, xs = np.meshgrid(np.arange(64.0), np.arange(96.0), indexing="ij")
    x2 = jnp.asarray((xs * 0.9 + 5 + 3 * np.sin(ys / 17)).astype(np.float32))
    y2 = jnp.asarray((ys * 1.02 - 2 + 2 * np.cos(xs / 23)).astype(np.float32))
    ref, vref = bilinear_sample(img, x2, y2)
    got, v = warp_rows_banded(img, x2, y2, band=32,
                              compute_dtype=jnp.float32)
    both = np.asarray(v & vref)
    assert both.mean() > 0.8
    np.testing.assert_allclose(np.asarray(got)[both],
                               np.asarray(ref)[both], atol=1e-3)
    # banded validity never accepts out-of-image samples
    assert not bool(jnp.any(v & ~vref))


def test_bf16_warp_close(rng):
    img = jnp.asarray(rng.uniform(0, 255, (32, 48)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(0, 46, (32, 48)).astype(np.float32))
    y2 = jnp.asarray(rng.uniform(0, 30, (32, 48)).astype(np.float32))
    ref, vref = bilinear_sample(img, x2, y2)
    got, v = warp_bilinear_matmul(img, x2, y2)   # bf16 path
    both = np.asarray(v & vref)
    err = np.abs(np.asarray(got)[both] - np.asarray(ref)[both])
    assert err.max() < 2.0   # bf16 value rounding only
