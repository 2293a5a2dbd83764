"""HDR subsystem: response recovery round-trip, merge, file formats."""

import os

import numpy as np
import pytest

from stereoreconstruction_tpu.hdr.response import (
    recover_response, response_curve)
from stereoreconstruction_tpu.hdr.merge import merge_hdr, pixel_weight
from stereoreconstruction_tpu.data.formats import (
    write_rgbe, read_rgbe, write_exr, read_exr, float_to_rgbe,
    rgbe_to_float)


def synth_stack(rng, gamma=2.2, n=5, h=60, w=80):
    """Synthetic exposure stack from a known log response g(v) =
    gamma * log(v/255)."""
    radiance = rng.uniform(0.02, 1.0, (h, w, 3)) ** 2 * 4.0
    # smooth it heavily so 7x7 patches pass the variance filter
    for _ in range(25):
        radiance = (radiance + np.roll(radiance, 1, 0)
                    + np.roll(radiance, 1, 1)
                    + np.roll(radiance, -1, 0)
                    + np.roll(radiance, -1, 1)) / 5.0
    exposures_ms = [31.25 * (2 ** i) for i in range(n)]
    images = []
    for e in exposures_ms:
        E = radiance * (e / 1000.0)
        v = 255.0 * np.clip(E, 0, 1) ** (1 / gamma)
        images.append(np.clip(np.round(v), 0, 255))
    return images, exposures_ms, radiance, gamma


class TestResponse:
    def test_recovers_gamma_curve(self, rng):
        images, exps, radiance, gamma = synth_stack(rng)
        resp = recover_response(images, exps, rng=rng)
        # true log response: g(v) = gamma*log(v/255) + C; compare shape in
        # the value range actually covered by samples (the smoothness prior
        # extrapolates outside it)
        vs = np.arange(70, 215)
        true = gamma * np.log(vs / 255.0)
        for ch in range(3):
            got = resp[vs, ch]
            # align offsets (the middle-zero constraint shifts both)
            got = got - got.mean()
            t = true - true.mean()
            err = np.abs(got - t)
            assert np.median(err) < 0.1, f"channel {ch}"

    def test_merge_reconstructs_radiance(self, rng):
        images, exps, radiance, gamma = synth_stack(rng)
        resp = recover_response(images, exps, rng=rng)
        hdr = merge_hdr(images, exps, resp)
        # up to global scale: compare ratios on mid-range pixels
        mask = (radiance > 0.1) & (radiance < 3.0)
        scale = np.median(hdr[mask] / radiance[mask])
        rel = np.abs(hdr[mask] / scale - radiance[mask]) / radiance[mask]
        assert np.median(rel) < 0.1

    def test_weight_function(self):
        assert pixel_weight(0) == 0
        assert pixel_weight(255) == 0
        assert pixel_weight(127) > 0.9
        assert pixel_weight(60) > pixel_weight(20)


class TestFormats:
    def test_rgbe_roundtrip(self, rng, tmp_path):
        img = rng.uniform(0, 8, (16, 20, 3))
        img[0, 0] = 0
        enc = rgbe_to_float(float_to_rgbe(img))
        rel = np.abs(enc - img) / np.maximum(img, 1e-6)
        assert np.median(rel[img > 1e-6]) < 0.01
        p = str(tmp_path / "t.hdr")
        write_rgbe(p, img)
        back = read_rgbe(p)
        assert back.shape == img.shape
        assert np.median(np.abs(back - img)[img > 0.01]) < 0.05

    def test_exr_roundtrip_float(self, rng, tmp_path):
        img = rng.uniform(0, 10, (12, 17, 3)).astype(np.float32)
        p = str(tmp_path / "t.exr")
        write_exr(p, img, half=False)
        back = read_exr(p)
        np.testing.assert_allclose(back, img, rtol=1e-6)

    def test_exr_roundtrip_half(self, rng, tmp_path):
        img = rng.uniform(0, 10, (8, 9, 3)).astype(np.float32)
        p = str(tmp_path / "t16.exr")
        write_exr(p, img, half=True)
        back = read_exr(p)
        np.testing.assert_allclose(back, img, rtol=2e-3)
