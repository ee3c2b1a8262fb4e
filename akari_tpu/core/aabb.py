"""Axis-aligned bounding boxes as (min, max) ``[..., 3]`` array pairs.

Replaces the reference's ``BoundingBox`` class (ref: src/akari/common/math.h:297-349:
expand/merge/intersect/surface_area/offset). Pure functions, backend-generic.
"""

from __future__ import annotations

import numpy as np

from .vecmath import _xp


def empty(shape=(), xp=np):
    inf = xp.float32(np.inf)
    lo = xp.full(shape + (3,), inf, dtype=xp.float32)
    hi = xp.full(shape + (3,), -inf, dtype=xp.float32)
    return lo, hi


def expand(lo, hi, p):
    xp = _xp(lo, p)
    return xp.minimum(lo, p), xp.maximum(hi, p)


def union(lo_a, hi_a, lo_b, hi_b):
    xp = _xp(lo_a, lo_b)
    return xp.minimum(lo_a, lo_b), xp.maximum(hi_a, hi_b)


def intersect_box(lo_a, hi_a, lo_b, hi_b):
    xp = _xp(lo_a, lo_b)
    return xp.maximum(lo_a, lo_b), xp.minimum(hi_a, hi_b)


def surface_area(lo, hi):
    xp = _xp(lo, hi)
    d = xp.maximum(hi - lo, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])


def centroid(lo, hi):
    return 0.5 * (lo + hi)


def offset(lo, hi, p):
    """Relative position of p inside the box in [0,1]^3."""
    xp = _xp(lo, p)
    d = hi - lo
    return (p - lo) / xp.where(d > 0.0, d, 1.0)


def ray_slab(lo, hi, o, inv_d, t_min, t_max):
    """Branchless slab test. All args broadcast; returns hit mask.

    ref: the traversal's AABB test (src/akari/kernel/bvh-accelerator.h:488-547)
    — here vectorized over ray x node lanes with no sign-based child ordering
    (ordering is handled by the threaded layout, see bvh/build.py).
    """
    xp = _xp(lo, o)
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    near = xp.minimum(t0, t1)
    far = xp.maximum(t0, t1)
    tn = xp.maximum(xp.max(near, axis=-1), t_min)
    tf = xp.minimum(xp.min(far, axis=-1), t_max)
    return tn <= tf
