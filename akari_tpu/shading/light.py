"""Area-light sampling (NEE) and light PDFs (for MIS), batched.

Capability parity with ref: src/akari/kernel/light.h:47-76 (uniform-area
triangle sampling converted to a solid-angle pdf, one-sided emission,
epsilon-offset shadow rays) and scene.select_light power sampling
(ref: kernel/scene.h select_light + nodes/scene.cpp:89-92 power CDF).
``pdf_direction`` (the probability NEE would have produced a given
BSDF-sampled hit) is new — it enables MIS, which the reference lacks
(pathtracer.h:102-111). Backend-generic (jnp / np).
"""

from __future__ import annotations

from typing import NamedTuple

from .. import sampling
from ..core.distribution import sample_discrete
from ..core.vecmath import _xp, cross, dot, normalize
from . import material as mat_mod

EPS = 1e-4
SHADOW_EPS = 1e-3


class LightSample(NamedTuple):
    wi: object        # [N,3] unit, surface -> light
    dist: object      # [N]
    L: object         # [N,3] emitted radiance toward the surface
    pdf: object       # [N] solid-angle pdf * selection pmf
    p_light: object   # [N,3] sampled point on the light
    ng_light: object  # [N,3] light geometric normal
    valid: object     # [N] bool


def _light_tri_data(scene, tri):
    """World-space (v0, e1, e2, ng, area) of light triangles.

    ``tri`` are (possibly virtual) prim ids; instanced scenes transform
    prototype geometry by the owning instance (scene/geom.py)."""
    from ..scene import geom

    xp = _xp(tri)
    v0, e1, e2 = geom.tri_world(scene, tri, xp)
    ng_raw = cross(e1, e2)
    area2 = xp.sqrt(xp.maximum(dot(ng_raw, ng_raw), 1e-20))
    ng = ng_raw / area2[..., None]
    area = 0.5 * area2
    return v0, e1, e2, ng, area


def _light_fat_table(scene, xp):
    """[L, 17] per-light resolved data: one aligned gather per NEE sample.

    Built per trace ([L]-sized work, hoisted off the per-lane hot path;
    emission stays differentiable through the texture value table).
    Columns: v0(0:3) e1(3:6) e2(6:9) ng(9:12) area(12) em(13:16) ds(16).
    Flat constant-texture scenes only.
    """
    from ..core.vecmath import cross as _cross

    lights = scene.lights
    tri = lights.tri_id
    v0 = xp.take(scene.tri_v0, tri, axis=0)
    e1 = xp.take(scene.tri_e1, tri, axis=0)
    e2 = xp.take(scene.tri_e2, tri, axis=0)
    ng_raw = _cross(e1, e2)
    area2 = xp.sqrt(xp.maximum(dot(ng_raw, ng_raw), 1e-20))
    ng = ng_raw / area2[..., None]
    area = 0.5 * area2
    mat_id = xp.take(scene.mat_id, tri)
    ct = mat_mod._resolved_closure_table(scene.materials, scene.textures, xp)
    fat = xp.take(ct, mat_id, axis=0)
    em, ds = fat[:, 5:8], fat[:, 8:9]
    return xp.concatenate(
        [v0, e1, e2, ng, area[:, None], em, ds], axis=1
    )


def sample(scene, u_select, u_pos, p_ref):
    """Power-select a light triangle, sample a point, return the NEE record.

    u_select: [N]; u_pos: [N,2]; p_ref: [N,3] shading points.
    """
    xp = _xp(p_ref)
    lights = scene.lights
    li, sel_pdf = sample_discrete(lights.cdf, u_select)

    fast = scene.instances is None and not scene.textures.has_images
    if fast:
        from ..ops.gather import gather_rows

        fat = gather_rows(_light_fat_table(scene, xp), li)
        v0, e1, e2 = fat[..., 0:3], fat[..., 3:6], fat[..., 6:9]
        ng = fat[..., 9:12]
        area = fat[..., 12]
        L = fat[..., 13:16]
        double_sided = fat[..., 16] > 0.5
    else:
        tri = xp.take(lights.tri_id, li)
        v0, e1, e2, ng, area = _light_tri_data(scene, tri)

    b = sampling.uniform_triangle(u_pos)
    p = v0 + b[..., 0:1] * e1 + b[..., 1:2] * e2

    wi_raw = p - p_ref
    dist2 = xp.maximum(dot(wi_raw, wi_raw), 1e-12)
    dist = xp.sqrt(dist2)
    wi = wi_raw / dist[..., None]

    cos_light = -dot(wi, ng)  # emission from the front face (ref light.h:66)
    if not fast:
        from ..scene import geom

        mat_id = geom.mat_of_prim(scene, tri, xp)
        double_sided = mat_mod.emissive_double_sided(scene.materials, mat_id)
        uv_tex = _light_uv(scene, tri, b)
        L = mat_mod.emission(scene.materials, scene.textures, mat_id, uv_tex)
    cos_eff = xp.where(double_sided, xp.abs(cos_light), cos_light)

    area_ok = cos_eff > 1e-6
    pdf = dist2 / (xp.maximum(cos_eff, 1e-6) * area) * sel_pdf
    valid = area_ok & (scene.lights.n_lights > 0)
    return LightSample(wi, dist, L, pdf, p, ng, valid)


def _light_uv(scene, tri, b):
    from ..scene import geom

    xp = _xp(b)
    uvs = geom.uvs_of_prim(scene, tri, xp)  # [N,3,2]
    b0 = 1.0 - b[..., 0:1] - b[..., 1:2]
    return uvs[..., 0, :] * b0 + uvs[..., 1, :] * b[..., 0:1] + uvs[..., 2, :] * b[..., 1:2]


def pdf_direction_from(e1, e2, sel_pdf, hit_ok, wi, dist, double_sided, xp):
    """``pdf_direction`` from already-gathered hit data (hot path).

    ``e1``/``e2`` are the hit triangle's edges (world), ``sel_pdf`` its
    light-selection pmf (0 for non-lights, SceneArrays.prim_table col 25) —
    all available from the surface-data fat gather, so MIS costs no extra
    memory traffic. ``hit_ok`` masks missed lanes (their ``dist`` is T_MAX;
    squaring it would overflow to inf and poison MIS weights with NaNs).
    Same math as ``pdf_direction``.
    """
    ng_raw = cross(e1, e2)
    area2 = xp.sqrt(xp.maximum(dot(ng_raw, ng_raw), 1e-20))
    ng = ng_raw / area2[..., None]
    area = 0.5 * area2
    cos_light = -dot(wi, ng)
    cos_eff = xp.where(double_sided, xp.abs(cos_light), cos_light)
    is_light = (sel_pdf > 0.0) & hit_ok
    d = xp.where(is_light, dist, 1.0)  # avoid inf*inf on missed lanes
    pdf = d * d / (xp.maximum(cos_eff, 1e-6) * area) * sel_pdf
    return xp.where(is_light & (cos_eff > 1e-6), pdf, 0.0)


def pdf_direction(scene, prim, wi, dist, ng_hit, double_sided):
    """Solid-angle pdf that NEE would sample the hit triangle ``prim`` from
    the origin along ``wi`` at distance ``dist`` — zero if prim is not a
    light. Used as the MIS counterpart of a BSDF-sampled emissive hit.
    """
    from ..scene import geom

    xp = _xp(wi)
    li = geom.light_of_prim(scene, xp.maximum(prim, 0), xp)
    is_light = (li >= 0) & (prim >= 0)
    sel_pdf = xp.take(scene.lights.pdf, xp.maximum(li, 0))
    _, _, _, ng, area = _light_tri_data(scene, xp.maximum(prim, 0))
    cos_light = -dot(wi, ng)
    cos_eff = xp.where(double_sided, xp.abs(cos_light), cos_light)
    d = xp.where(is_light, dist, 1.0)  # avoid inf*inf on missed lanes
    pdf = d * d / (xp.maximum(cos_eff, 1e-6) * area) * sel_pdf
    return xp.where(is_light & (cos_eff > 1e-6), pdf, 0.0)
