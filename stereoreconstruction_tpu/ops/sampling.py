"""Image sampling with the reference's VectorImage semantics.

* ``pixel(x, y)``: integer lookup, out-of-bounds -> INVALID
  (util/vectorimage.cpp:115-119).  The reference indexes with C++ ``int``
  casts (truncation toward zero); for the coordinates that matter (>= -1)
  this equals ``floor`` except in (-1, 0) where truncation gives 0 — we use
  truncation to match.
* ``sample(x, y)``: bilinear, valid iff ``x >= 0 && y >= 0 && x+1 < w &&
  y+1 < h`` (util/vectorimage.cpp:128-155).

Instead of NaN-sentinel RGBA pixels, these return ``(value, valid)`` pairs —
branch-free and TPU-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def _trunc(x):
    """C++ (int) cast: truncation toward zero."""
    return jnp.trunc(x).astype(jnp.int32)


def pixel_lookup(img, x, y):
    """Integer pixel lookup with OOB invalidity.

    img: [H, W] or [H, W, C]; x, y: broadcastable float or int arrays.
    Returns (values, valid).
    """
    h, w = img.shape[0], img.shape[1]
    ix = _trunc(x) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x
    iy = _trunc(y) if jnp.issubdtype(jnp.asarray(y).dtype, jnp.floating) else y
    valid = (ix >= 0) & (iy >= 0) & (ix < w) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    vals = img[iyc, ixc]
    return vals, valid


def bilinear_sample(img, x, y):
    """VectorImage::sample: bilinear with the reference's validity rule.

    img: [H, W] (single channel). Returns (values, valid); values are 0 where
    invalid (caller must mask via ``valid``).
    """
    h, w = img.shape[0], img.shape[1]
    valid = (x >= 0) & (y >= 0) & (x + 1 < w) & (y + 1 < h)

    ix = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    iy = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    dx = x - ix
    dy = y - iy

    v00 = img[iy, ix]
    v01 = img[iy, ix + 1]
    v10 = img[iy + 1, ix]
    v11 = img[iy + 1, ix + 1]

    out = (v00 * (1 - dx) * (1 - dy) + v01 * dx * (1 - dy)
           + v10 * (1 - dx) * dy + v11 * dx * dy)
    return jnp.where(valid, out, 0.0), valid


def window_patches(img, radius: int, fill=0.0):
    """All window-shifted copies of an image as stacked static slices.

    Returns ``win[S, S, H, W]`` with ``win[r+R, c+R, y, x] = img[y+r, x+c]``
    (OOB -> ``fill``).

    Implementation note: this was previously one
    ``conv_general_dilated_patches`` (im2col) op, but XLA:TPU runs that
    convolution on the MXU at DEFAULT precision, which truncates the
    *values* to bfloat16 (measured round 4: gray/distance values snapped
    to the bf16 grid, e.g. 273.014 -> 274.0 — the root cause of the
    radius-5 geodesic-weights parity failure and a bias on every NCC
    window sourced here).  S^2 static slices are pure data movement —
    bit-exact, no MXU involvement, and XLA fuses the stack into one copy.
    """
    size = 2 * radius + 1
    h, w = img.shape
    dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) \
        else jnp.float32
    padded = jnp.pad(img.astype(dtype), radius, constant_values=fill)
    rows = [
        jnp.stack([padded[r:r + h, c:c + w] for c in range(size)])
        for r in range(size)
    ]
    return jnp.stack(rows)          # [S, S, H, W]


def shifted_windows(img, radius: int, fill=0.0):
    """``window_patches`` + validity mask ``[S, S, H, W]`` (False where the
    window pixel falls outside the image)."""
    win = window_patches(img, radius, fill=fill)
    vwin = window_patches(jnp.ones(img.shape, jnp.float32), radius,
                          fill=0.0) > 0.5
    if img.dtype == jnp.bool_:
        win = win > 0.5
    return win, vwin
