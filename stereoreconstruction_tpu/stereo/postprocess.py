"""Depth-map post-processing: gap filling + weighted-median filtering.

Re-implements ``TwoViewStereo::filterInvalidPixels`` (twoviewstereo.cpp:
676-811, compiled out in the reference but present) and ``weightedMedian``
(:821-860):

* ``fill_gaps``: horizontal runs of rejected (inf) pixels narrower than
  GAP_WIDTH_THRESHOLD are filled symmetrically from both run ends,
* ``weighted_median_fill``: invalid pixels take the geodesic-weighted
  median of the finite depths in their support window — vectorized with a
  fixed-length sort over the window axis.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.sampling import shifted_windows


def fill_gaps(depth: np.ndarray, gap_width_threshold: int = 2) -> np.ndarray:
    """Host-side run-length gap filling (twoviewstereo.cpp:683-724)."""
    out = np.asarray(depth, np.float64).copy()
    h, w = out.shape
    for y in range(h):
        x = 0
        while x < w:
            ldepth = out[y, x]
            while x < w and not np.isinf(out[y, x]):
                ldepth = out[y, x]
                x += 1
            if x >= w:
                continue
            start = x
            while x < w and np.isinf(out[y, x]):
                x += 1
            rdepth = out[y, x] if x < w else np.nan
            end = x - 1
            if end - start < gap_width_threshold:
                ld, rd = ldepth, rdepth
                if not np.isfinite(ld):
                    ld = rd
                if not np.isfinite(rd):
                    rd = ld
                a, b = start, end
                while a <= b:
                    out[y, a] = ld
                    out[y, b] = rd
                    a += 1
                    b -= 1
    return out


def weighted_median_fill(depth, weights, min_depth: float,
                         max_depth: float):
    """Fill non-finite pixels with the weighted median of their window.

    depth: [H, W]; weights: [S, S, H, W] (per-pixel support weights).
    Median rule matches the reference's heap sweep (twoviewstereo.cpp:
    845-858): pop descending values until the popped weight total exceeds
    the remaining total — i.e. the upper weighted median.
    """
    depth = jnp.asarray(depth)
    size = weights.shape[0]
    radius = size // 2
    # conv-based windowing poisons on non-finite values: split into a
    # sanitized value plane + finiteness plane
    finite = jnp.isfinite(depth)
    safe = jnp.where(finite, depth, 0.0)
    win, inb = shifted_windows(safe, radius, fill=0.0)
    fin_win, _ = shifted_windows(finite.astype(depth.dtype), radius,
                                 fill=0.0)

    ok = ((fin_win > 0.5) & inb & (win >= min_depth)
          & (win <= max_depth) & (weights > 1e-10))
    w = jnp.where(ok, weights, 0.0)
    v = jnp.where(ok, win, jnp.inf)

    ss = size * size
    h, wd = depth.shape
    v_flat = v.reshape(ss, h, wd)
    w_flat = w.reshape(ss, h, wd)

    order = jnp.argsort(v_flat, axis=0)
    v_sorted = jnp.take_along_axis(v_flat, order, axis=0)
    w_sorted = jnp.take_along_axis(w_flat, order, axis=0)

    total = jnp.sum(w_sorted, axis=0)
    # upper weighted median: largest value v_k with sum(w >= v_k) * 2 >
    # total -> equivalently cumulative-from-top crossing total/2
    cum_top = jnp.cumsum(w_sorted[::-1], axis=0)[::-1]
    take = cum_top * 2 > total
    # last index where take is True
    idx = jnp.max(jnp.where(take, jnp.arange(ss)[:, None, None], -1),
                  axis=0)
    med = jnp.take_along_axis(v_sorted, idx[None], axis=0)[0]
    n_ok = jnp.sum(ok.reshape(ss, h, wd), axis=0)
    med = jnp.where((n_ok > 1) & (total > 1e-10) & jnp.isfinite(med),
                    med, jnp.nan)

    return jnp.where(jnp.isfinite(depth), depth, med)
