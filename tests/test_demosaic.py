"""Bayer demosaic: pattern layout, constant-image fidelity, es parity with
a literal scalar port on small images."""

import numpy as np

from stereoreconstruction_tpu.data.demosaic import (
    demosaic_es, demosaic_nn, demosaic_bl, demosaic_hue, _masks)


def bayer_from_rgb(rgb):
    """Sample an RGB image through the GRBG mosaic."""
    h, w = rgb.shape[:2]
    g, r, b = _masks(h, w)
    raw = np.zeros((h, w), np.uint8)
    raw[g] = rgb[g, 1]
    raw[r] = rgb[r, 0]
    raw[b] = rgb[b, 2]
    return raw


def scalar_es(raw):
    """Literal port of es.cpp for parity checking."""
    raw = raw.astype(np.int64)
    h, w = raw.shape
    out = np.zeros((h, w, 3), np.int64)

    def get(x, y):
        if 0 <= x < w and 0 <= y < h:
            return raw[y, x], 1
        return 0, 0

    mask = "GRBG"
    for y in range(h):
        for x in range(w):
            shift = ((x + 1) % 2) + 2 * ((y + 1) % 2)
            mv = mask[3 - shift]
            if mv in "RB":
                N, cn = get(x, y - 1)
                S, cs = get(x, y + 1)
                W, cw = get(x - 1, y)
                E, ce = get(x + 1, y)
                hcount, vcount = cw + ce, cn + cs
                dh, dv = abs(E - W), abs(N - S)
                t = (dh + dv) // 2
                if dh < t and dv > t:
                    out[y, x, 1] = (E + W) // hcount
                elif dh > t and dv < t:
                    out[y, x, 1] = (N + S) // vcount
                else:
                    out[y, x, 1] = (N + E + S + W) // (hcount + vcount)
            else:
                out[y, x, 1] = raw[y, x]

    for y in range(h):
        for x in range(w):
            shift = ((x + 1) % 2) + 2 * ((y + 1) % 2)
            mv = mask[3 - shift]
            if mv == "G":
                s1, c1 = 0, 0
                for dy in (-1, 1):
                    v, c = get(x, y + dy)
                    s1 += v
                    c1 += c
                s2, c2 = 0, 0
                for dx in (-1, 1):
                    v, c = get(x + dx, y)
                    s2 += v
                    c2 += c
                if y % 2 == 0:
                    out[y, x, 0] = 0 if c1 == 0 else s2 // c2
                    out[y, x, 2] = 0 if c2 == 0 else s1 // c1
                else:
                    out[y, x, 0] = 0 if c2 == 0 else s1 // c1
                    out[y, x, 2] = 0 if c1 == 0 else s2 // c2
            else:
                s, c = 0, 0
                for dy in (-1, 1):
                    for dx in (-1, 1):
                        v, cc = get(x + dx, y + dy)
                        s += v
                        c += cc
                if y % 2 == 0:
                    out[y, x, 0] = raw[y, x]
                    out[y, x, 2] = s // c
                else:
                    out[y, x, 2] = raw[y, x]
                    out[y, x, 0] = s // c
    return np.clip(out, 0, 255).astype(np.uint8)


class TestMaskLayout:
    def test_grbg(self):
        g, r, b = _masks(4, 4)
        assert g[0, 0] and r[0, 1] and b[1, 0] and g[1, 1]


class TestDemosaic:
    def test_constant_image(self):
        raw = np.full((16, 20), 77, np.uint8)
        for fn in (demosaic_es, demosaic_nn, demosaic_bl, demosaic_hue):
            out = fn(raw)
            assert np.abs(out.astype(int) - 77).max() <= 1, fn.__name__

    def test_es_matches_scalar_port(self, rng):
        raw = rng.integers(0, 256, (14, 18)).astype(np.uint8)
        got = demosaic_es(raw)
        want = scalar_es(raw)
        np.testing.assert_array_equal(got, want)

    def test_smooth_gradient_recovery(self, rng):
        ys, xs = np.mgrid[0:24, 0:32]
        rgb = np.stack([100 + 2 * xs, 80 + ys, 120 - xs], -1)
        rgb = np.clip(rgb, 0, 255).astype(np.uint8)
        raw = bayer_from_rgb(rgb)
        out = demosaic_es(raw)
        inner = (slice(2, -2), slice(2, -2))
        err = np.abs(out[inner].astype(int) - rgb[inner].astype(int))
        assert err.mean() < 3.0
