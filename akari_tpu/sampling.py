"""Sampling warps u in [0,1)^2 -> directions/points, with PDFs.

Capability parity with ref: src/akari/kernel/sampling.h:30-70 (concentric
disk, cosine hemisphere, uniform sphere, uniform triangle) — re-derived
branchless for SIMD/vmap execution, Z-up local frames.
"""

from __future__ import annotations

import numpy as np

from .core.vecmath import _xp

INV_PI = 1.0 / np.pi


def concentric_disk(u):
    """[...,2] uniform -> [...,2] point on unit disk (concentric mapping)."""
    xp = _xp(u)
    uo = 2.0 * u - 1.0
    x, y = uo[..., 0], uo[..., 1]
    ax, ay = xp.abs(x), xp.abs(y)
    use_x = ax > ay
    r = xp.where(use_x, x, y)
    safe = lambda d: xp.where(d == 0.0, 1.0, d)
    theta = xp.where(
        use_x,
        (np.pi / 4.0) * (y / safe(x)),
        (np.pi / 2.0) - (np.pi / 4.0) * (x / safe(y)),
    )
    degenerate = (x == 0.0) & (y == 0.0)
    px = xp.where(degenerate, 0.0, r * xp.cos(theta))
    py = xp.where(degenerate, 0.0, r * xp.sin(theta))
    return xp.stack([px, py], axis=-1)


def cosine_hemisphere(u):
    """[...,2] -> [...,3] cosine-weighted direction, Z-up."""
    xp = _xp(u)
    d = concentric_disk(u)
    r2 = d[..., 0] ** 2 + d[..., 1] ** 2
    z = xp.sqrt(xp.maximum(0.0, 1.0 - r2))
    return xp.stack([d[..., 0], d[..., 1], z], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def uniform_sphere(u):
    xp = _xp(u)
    z = 1.0 - 2.0 * u[..., 0]
    r = xp.sqrt(xp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * np.pi * u[..., 1]
    return xp.stack([r * xp.cos(phi), r * xp.sin(phi), z], axis=-1)


def uniform_sphere_pdf():
    return 1.0 / (4.0 * np.pi)


def uniform_hemisphere(u):
    xp = _xp(u)
    z = u[..., 0]
    r = xp.sqrt(xp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * np.pi * u[..., 1]
    return xp.stack([r * xp.cos(phi), r * xp.sin(phi), z], axis=-1)


def uniform_hemisphere_pdf():
    return 1.0 / (2.0 * np.pi)


def uniform_triangle(u):
    """[...,2] -> barycentric (b0, b1) uniformly over a triangle."""
    xp = _xp(u)
    su0 = xp.sqrt(u[..., 0])
    b0 = 1.0 - su0
    b1 = u[..., 1] * su0
    return xp.stack([b0, b1], axis=-1)


def power_heuristic(pdf_a, pdf_b):
    """MIS power heuristic (beta=2) weight for strategy A.

    New capability vs the reference, which is NEE-only with depth-0 emissive
    (ref: kernel/pathtracer.h:102-111 has no MIS).
    """
    xp = _xp(pdf_a, pdf_b)
    # clamp before squaring: a huge (near-delta) pdf squared overflows f32
    # and inf/inf = NaN even though the weight limit is a clean 1.
    pdf_a = xp.minimum(pdf_a, 1e18)
    pdf_b = xp.minimum(pdf_b, 1e18)
    a2 = pdf_a * pdf_a
    denom = a2 + pdf_b * pdf_b
    return xp.where(denom > 0.0, a2 / xp.where(denom > 0.0, denom, 1.0), 0.0)
