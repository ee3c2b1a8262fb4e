"""Material table lookup: mix-tree selection + BSDF closure parameters.

Capability parity with ref: src/akari/kernel/material.h:249-299 —
``select_material`` walks Mix nodes stochastically accumulating a
choice_pdf (material.h:255-271); ``get_bsdf`` builds the closure. The
pointer walk becomes a fixed MAX_MIX_DEPTH-unrolled id walk over the flat
MaterialTable (no data-dependent trip counts under jit).
Backend-generic (jnp / np).
"""

from __future__ import annotations

from ..core.vecmath import _xp
from ..scene.arrays import (
    MAT_DIFFUSE,
    MAT_EMISSIVE,
    MAT_GLOSSY,
    MAT_MIRROR,
    MAT_MIX,
    MAX_MIX_DEPTH,
)
from . import microfacet as mf
from . import texture as tex
from .bsdf import (
    CLOSURE_DIFFUSE,
    CLOSURE_MICROFACET,
    CLOSURE_NULL,
    CLOSURE_SPECULAR,
)


def select_material(materials, textures, mat_id, u, uv):
    """Resolve Mix chains: ([N] ids, [N] u, [N,2] uv) -> (leaf_id, choice_pdf).

    Picks B with probability ``fraction`` (rescaling u each step), matching
    the reference's walk (material.h:255-271: u < frac -> B, pdf *= 1/frac).
    """
    xp = _xp(u)
    choice_pdf = xp.ones_like(u)
    cur = mat_id
    for _ in range(MAX_MIX_DEPTH):
        kind = xp.take(materials.kind, cur)
        is_mix = kind == MAT_MIX
        frac_tex = xp.take(materials.fraction_tex, cur)
        frac = xp.clip(tex.evaluate_scalar(textures, frac_tex, uv), 1e-4, 1.0 - 1e-4)
        pick_b = u < frac
        next_id = xp.where(
            pick_b, xp.take(materials.mix_b, cur), xp.take(materials.mix_a, cur)
        )
        new_u = xp.where(pick_b, u / frac, (u - frac) / (1.0 - frac))
        step_pdf = xp.where(pick_b, 1.0 / frac, 1.0 / (1.0 - frac))
        cur = xp.where(is_mix, next_id, cur)
        u = xp.where(is_mix, new_u, u)
        choice_pdf = xp.where(is_mix, choice_pdf * step_pdf, choice_pdf)
    return cur, choice_pdf


def closure_params(materials, textures, leaf_id, choice_pdf, uv):
    """Leaf material ids -> SoA closure params for shading/bsdf.py.

    Glossy roughness is squared before use as the microfacet alpha
    (ref: GlossyMaterial::get_bsdf, material.h:198-205).
    """
    xp = _xp(choice_pdf)
    kind = xp.take(materials.kind, leaf_id)
    color = tex.evaluate(textures, xp.take(materials.color_tex, leaf_id), uv)
    rough = tex.evaluate_scalar(
        textures, xp.take(materials.roughness_tex, leaf_id), uv
    )
    alpha = xp.maximum(rough * rough, 1e-4)
    closure_kind = xp.where(
        kind == MAT_DIFFUSE,
        CLOSURE_DIFFUSE,
        xp.where(
            kind == MAT_GLOSSY,
            CLOSURE_MICROFACET,
            xp.where(kind == MAT_MIRROR, CLOSURE_SPECULAR, CLOSURE_NULL),
        ),
    )
    return {
        "kind": closure_kind,
        "color": color,
        "alpha": alpha,
        "dist": xp.full_like(closure_kind, mf.GGX),
        "choice_pdf": choice_pdf,
    }


def emission(materials, textures, mat_id, uv):
    """[N,3] emitted radiance (zero for non-emissive materials)."""
    xp = _xp(uv)
    kind = xp.take(materials.kind, mat_id)
    color = tex.evaluate(textures, xp.take(materials.color_tex, mat_id), uv)
    return xp.where((kind == MAT_EMISSIVE)[..., None], color, 0.0)


def is_emissive(materials, mat_id):
    xp = _xp(mat_id)
    return xp.take(materials.kind, mat_id) == MAT_EMISSIVE


def emissive_double_sided(materials, mat_id):
    xp = _xp(mat_id)
    return xp.take(materials.double_sided, mat_id)
