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
    MAT_GLASS,
    MAT_GLOSSY,
    MAT_MIRROR,
    MAT_MIX,
    MAX_MIX_DEPTH,
)
from . import microfacet as mf
from . import texture as tex
from .bsdf import (
    CLOSURE_DIFFUSE,
    CLOSURE_GLASS,
    CLOSURE_MICROFACET,
    CLOSURE_NULL,
    CLOSURE_SPECULAR,
)


def _resolved_closure_table(materials, textures, xp):
    """[M, 16] closure params resolved against CONSTANT textures.

    Built per trace from the (differentiable) texture value table — [M]-sized
    work hoisted out of the per-lane hot path so shading needs exactly one
    aligned fat gather per use site (ops/gather.py) instead of ~8 narrow
    ones. Only valid when ``textures.has_images`` is False (image textures
    make params uv-dependent; those scenes take the general path).

    Columns: closure_kind(0) color(1:4) alpha(4) emission(5:8)
    double_sided(8) frac(9) mix_a(10) mix_b(11) is_mix(12) ior(13)
    pad(14:16).
    """
    kind = materials.kind
    color = xp.take(textures.value, materials.color_tex, axis=0)  # [M,3]
    rough = xp.take(textures.value[:, 0], materials.roughness_tex)
    frac = xp.clip(
        xp.take(textures.value[:, 0], materials.fraction_tex), 1e-4, 1.0 - 1e-4
    )
    # clip: roughness is physically in [0,1]; non-glossy rows point their
    # roughness_tex at arbitrary texels (e.g. radiance), and an unbounded
    # alpha makes the (masked) microfacet branch numerically wild.
    alpha = xp.clip(rough * rough, 1e-4, 1.0)
    closure_kind = xp.where(
        kind == MAT_DIFFUSE,
        CLOSURE_DIFFUSE,
        xp.where(
            kind == MAT_GLOSSY,
            CLOSURE_MICROFACET,
            xp.where(
                kind == MAT_MIRROR,
                CLOSURE_SPECULAR,
                xp.where(kind == MAT_GLASS, CLOSURE_GLASS, CLOSURE_NULL),
            ),
        ),
    )
    emission_rgb = xp.where((kind == MAT_EMISSIVE)[:, None], color, 0.0)
    m = kind.shape[0]
    f32 = xp.float32
    ior = (
        xp.asarray(materials.ior, f32) if materials.ior is not None
        else xp.full((m,), 1.5, f32)
    )
    cols = [
        closure_kind.astype(f32)[:, None],
        color.astype(f32),
        alpha.astype(f32)[:, None],
        emission_rgb.astype(f32),
        materials.double_sided.astype(f32)[:, None],
        frac.astype(f32)[:, None],
        materials.mix_a.astype(f32)[:, None],
        materials.mix_b.astype(f32)[:, None],
        (kind == MAT_MIX).astype(f32)[:, None],
        ior[:, None],
        xp.zeros((m, 2), f32),
    ]
    return xp.concatenate(cols, axis=1)


def select_material(materials, textures, mat_id, u, uv):
    """Resolve Mix chains: ([N] ids, [N] u, [N,2] uv) -> (leaf_id, choice_pdf).

    Picks B with probability ``fraction`` (rescaling u each step), matching
    the reference's walk (material.h:255-271: u < frac -> B, pdf *= 1/frac).
    Scenes without Mix materials skip the walk statically.
    """
    xp = _xp(u)
    if not materials.has_mix:
        return mat_id, xp.ones_like(u)
    if not textures.has_images:
        from ..ops.gather import gather_rows

        ct = _resolved_closure_table(materials, textures, xp)
        choice_pdf = xp.ones_like(u)
        cur = mat_id
        for _ in range(MAX_MIX_DEPTH):
            fat = gather_rows(ct, cur)
            is_mix = fat[..., 12] > 0.5
            frac = fat[..., 9]
            safe_frac = xp.clip(frac, 1e-4, 1.0 - 1e-4)
            pick_b = u < safe_frac
            next_id = xp.where(pick_b, fat[..., 11], fat[..., 10]).astype(
                xp.int32
            )
            new_u = xp.where(
                pick_b, u / safe_frac, (u - safe_frac) / (1.0 - safe_frac)
            )
            step_pdf = xp.where(pick_b, 1.0 / safe_frac, 1.0 / (1.0 - safe_frac))
            cur = xp.where(is_mix, next_id, cur)
            u = xp.where(is_mix, new_u, u)
            choice_pdf = xp.where(is_mix, choice_pdf * step_pdf, choice_pdf)
        return cur, choice_pdf
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
    (ref: GlossyMaterial::get_bsdf, material.h:198-205). Constant-texture
    scenes resolve via one fat gather; image textures take the general path.
    """
    xp = _xp(choice_pdf)
    if not textures.has_images:
        from ..ops.gather import gather_rows

        ct = _resolved_closure_table(materials, textures, xp)
        fat = gather_rows(ct, leaf_id)
        return {
            "kind": fat[..., 0].astype(xp.int32),
            "color": fat[..., 1:4],
            "alpha": fat[..., 4],
            "dist": xp.full(leaf_id.shape, mf.GGX, xp.int32),
            "ior": fat[..., 13],
            "choice_pdf": choice_pdf,
        }
    kind = xp.take(materials.kind, leaf_id)
    color = tex.evaluate(textures, xp.take(materials.color_tex, leaf_id), uv)
    rough = tex.evaluate_scalar(
        textures, xp.take(materials.roughness_tex, leaf_id), uv
    )
    # clip: roughness is physically in [0,1]; non-glossy rows point their
    # roughness_tex at arbitrary texels (e.g. radiance), and an unbounded
    # alpha makes the (masked) microfacet branch numerically wild.
    alpha = xp.clip(rough * rough, 1e-4, 1.0)
    closure_kind = xp.where(
        kind == MAT_DIFFUSE,
        CLOSURE_DIFFUSE,
        xp.where(
            kind == MAT_GLOSSY,
            CLOSURE_MICROFACET,
            xp.where(
                kind == MAT_MIRROR,
                CLOSURE_SPECULAR,
                xp.where(kind == MAT_GLASS, CLOSURE_GLASS, CLOSURE_NULL),
            ),
        ),
    )
    ior_t = (
        xp.take(xp.asarray(materials.ior), leaf_id)
        if materials.ior is not None
        else xp.full(leaf_id.shape, 1.5, xp.float32)
    )
    return {
        "kind": closure_kind,
        "color": color,
        "alpha": alpha,
        "dist": xp.full_like(closure_kind, mf.GGX),
        "ior": ior_t,
        "choice_pdf": choice_pdf,
    }


def emission(materials, textures, mat_id, uv):
    """[N,3] emitted radiance (zero for non-emissive materials)."""
    xp = _xp(uv)
    if not textures.has_images:
        return emission_and_sided(materials, textures, mat_id, uv)[0]
    kind = xp.take(materials.kind, mat_id)
    color = tex.evaluate(textures, xp.take(materials.color_tex, mat_id), uv)
    return xp.where((kind == MAT_EMISSIVE)[..., None], color, 0.0)


def emission_and_sided(materials, textures, mat_id, uv):
    """([N,3] Le, [N] double_sided) in one fat gather (hot-path helper)."""
    xp = _xp(uv)
    if not textures.has_images:
        from ..ops.gather import gather_rows

        ct = _resolved_closure_table(materials, textures, xp)
        fat = gather_rows(ct, mat_id)
        return fat[..., 5:8], fat[..., 8] > 0.5
    return (
        emission(materials, textures, mat_id, uv),
        emissive_double_sided(materials, mat_id),
    )


def is_emissive(materials, mat_id):
    xp = _xp(mat_id)
    return xp.take(materials.kind, mat_id) == MAT_EMISSIVE


def emissive_double_sided(materials, mat_id):
    xp = _xp(mat_id)
    return xp.take(materials.double_sided, mat_id)
