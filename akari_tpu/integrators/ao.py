"""Ambient-occlusion integrator.

Capability parity with ref: src/akari/kernel/integrators/cpu/integrator.cpp:40-87
(cpu::AmbientOcclusion) and the GPU twin (integrators/gpu/integrator.h:29-38):
primary hit -> one cosine-sampled occlusion ray -> white if unoccluded.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import sampling
from ..core import rng
from ..core.vecmath import dot
from ..shading import bsdf as bsdf_mod
from .path import RAY_EPS, camera_rays, _surface_data


@dataclass(frozen=True)
class AOConfig:
    spp: int = 16
    occlude_distance: float = 1e30  # ref: AO 'occlude' field


def trace_ao(scene, camera, cfg, seed, sample_idx, pixel_idx, intersect_fn, occlude_fn, xp):
    o, d = camera_rays(camera, seed, sample_idx, pixel_idx, xp)
    n = o.shape[0]
    t, prim, bary, valid = intersect_fn(o, d)
    p, ng, ns, uv, mat_id = _surface_data(scene, prim, bary, xp)
    u = rng.uniform2(seed, pixel_idx, sample_idx, rng.bounce_dim(0, rng.OFF_BSDF_U))
    w_local = sampling.cosine_hemisphere(u)
    frame = bsdf_mod.make_frame(ns)
    from ..core.vecmath import to_world

    w = to_world(*frame, w_local)
    # flip into the hemisphere the camera sees
    w = xp.where((dot(w, ng) * dot(-d, ng) < 0.0)[..., None], -w, w)
    o2 = p + w * (RAY_EPS / xp.maximum(xp.abs(dot(ng, w)), 1e-4))[..., None]
    occluded = occlude_fn(
        o2, w, xp.zeros((n,), xp.float32),
        xp.full((n,), cfg.occlude_distance, xp.float32),
    )
    lit = valid & ~occluded
    L = xp.where(lit[..., None], xp.ones((n, 3), xp.float32), 0.0)
    # miss -> background (black), matching the reference AO miss behavior
    return xp.where(valid[..., None], L, 0.0)


def render_ao(scene, camera, cfg, seed=0):
    import jax
    import jax.numpy as jnp

    from .path import _jax_intersectors

    n = camera.width * camera.height
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)
    intersect_fn, occlude_fn, fused_fn = _jax_intersectors(scene)

    def body(acc, s):
        li = trace_ao(
            scene, camera, cfg, seed, s, pixel_idx, intersect_fn, occlude_fn, jnp
        )
        return acc + li, None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((n, 3), jnp.float32), jnp.arange(cfg.spp, dtype=jnp.uint32)
    )
    return (acc / cfg.spp).reshape(camera.height, camera.width, 3)
