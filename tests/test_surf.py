"""SURF detector/descriptor: repeatability + matching sanity."""

import numpy as np
import pytest

from stereoreconstruction_tpu.features.surf import (
    detect_and_describe, integral_image)
from stereoreconstruction_tpu.features.matching import match_descriptors
from stereoreconstruction_tpu.config import MatchConfig

from test_twoview import smooth_image


def textured_image(rng, h=160, w=200):
    """Blob-textured image with strong local structure."""
    img = np.zeros((h, w))
    for _ in range(60):
        cy, cx = rng.uniform(10, h - 10), rng.uniform(10, w - 10)
        r = rng.uniform(3, 9)
        a = rng.uniform(60, 255)
        ys, xs = np.mgrid[0:h, 0:w]
        img += a * np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * r * r))
    return np.clip(img, 0, 255)


class TestIntegralImage:
    def test_box_sums(self, rng):
        g = rng.uniform(0, 10, (12, 15))
        import jax.numpy as jnp
        ii = np.asarray(integral_image(jnp.asarray(g)))
        assert np.allclose(ii[5, 7], g[:5, :7].sum())
        assert np.allclose(ii[-1, -1], g.sum())


class TestSurf:
    def test_detects_blobs(self, rng):
        img = textured_image(rng)
        fs = detect_and_describe(img, threshold=20.0, max_keypoints=200)
        assert len(fs.xy) > 10
        assert fs.descriptors.shape[1] == 64
        norms = np.linalg.norm(fs.descriptors, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_shift_repeatability(self, rng):
        img = textured_image(rng)
        f1 = detect_and_describe(img[:-8, :-8], threshold=20.0,
                                 max_keypoints=150)
        f2 = detect_and_describe(img[8:, 8:], threshold=20.0,
                                 max_keypoints=150)
        m = match_descriptors(f1.descriptors, f2.descriptors,
                              MatchConfig(max_cost=2.0, ratio=0.8))
        assert len(m) > 20
        good = sum(1 for i, j in m
                   if np.abs((f1.xy[i] - 8) - f2.xy[j]).max() < 2.0)
        assert good / len(m) > 0.9
