"""RGB spectrum helpers (ref: src/akari/common/color.h:27-66).

The reference's variant system can instantiate mono/rgb x float/double
renderers via build-time codegen (tools/configure.cpp). Here the "variant"
is simply the trailing channel dimension and dtype of plain arrays — JAX
retraces automatically, so no codegen is needed (SURVEY.md §7 design stance).
"""

from __future__ import annotations

import numpy as np

from .vecmath import _xp


def luminance(rgb):
    xp = _xp(rgb)
    w = xp.asarray([0.2126, 0.7152, 0.0722], dtype=xp.float32)
    return xp.sum(rgb * w, axis=-1)


def linear_to_srgb(c):
    xp = _xp(c)
    c = xp.clip(c, 0.0, 1.0)
    return xp.where(
        c < 0.0031308,
        12.92 * c,
        1.055 * xp.power(xp.maximum(c, 1e-8), 1.0 / 2.4) - 0.055,
    )


def srgb_to_linear(c):
    xp = _xp(c)
    return xp.where(
        c < 0.04045,
        c / 12.92,
        xp.power(xp.maximum((c + 0.055) / 1.055, 1e-8), 2.4),
    )


def is_black(rgb):
    xp = _xp(rgb)
    return xp.all(rgb <= 0.0, axis=-1)


def clamp_zero(rgb):
    """Replace NaN/negative with zero (ref: color.h clamp_zero)."""
    xp = _xp(rgb)
    return xp.where(xp.isnan(rgb) | (rgb < 0.0), 0.0, rgb)


def to_uint8_srgb(img_linear):
    """[H,W,3] linear float -> uint8 sRGB (host-side, numpy)."""
    img = np.asarray(img_linear, dtype=np.float32)
    srgb = linear_to_srgb(img)
    return (np.clip(srgb, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
