"""BSDF/material physics tests: energy conservation (white furnace),
pdf consistency (sample pdf == evaluate_pdf), reciprocity, mix selection.
"""

import numpy as np

from akari_tpu.core import rng
from akari_tpu.shading import bsdf, microfacet as mf


def _params(kind, color=(1.0, 1.0, 1.0), alpha=0.1, n=1):
    return {
        "kind": np.full(n, kind, np.int32),
        "color": np.tile(np.asarray(color, np.float32), (n, 1)),
        "alpha": np.full(n, alpha, np.float32),
        "dist": np.full(n, mf.GGX, np.int32),
        "choice_pdf": np.ones(n, np.float32),
    }


def _rand_u2(n, seed=0):
    pix = np.arange(n, dtype=np.uint32)
    return rng.uniform2(seed, pix, 0, 0)


def test_diffuse_white_furnace():
    """Integral of f*cos over hemisphere == albedo (Lambert)."""
    n = 1 << 15
    p = _params(bsdf.CLOSURE_DIFFUSE, color=(0.7, 0.5, 0.3), n=n)
    wo = np.tile(np.asarray([0.3, 0.2, 0.93], np.float32), (n, 1))
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wi, f, pdf = bsdf.sample_local(p, wo, _rand_u2(n))
    est = f * np.abs(wi[..., 2:3]) / np.maximum(pdf, 1e-9)[..., None]
    mean = est.mean(axis=0)
    np.testing.assert_allclose(mean, [0.7, 0.5, 0.3], atol=0.02)


def test_diffuse_pdf_consistency():
    n = 4096
    p = _params(bsdf.CLOSURE_DIFFUSE, n=n)
    wo = np.tile(np.asarray([0.0, 0.0, 1.0], np.float32), (n, 1))
    wi, f, pdf = bsdf.sample_local(p, wo, _rand_u2(n, seed=1))
    pdf2 = bsdf.pdf_local(p, wo, wi)
    np.testing.assert_allclose(pdf, pdf2, rtol=1e-4, atol=1e-6)


def test_microfacet_pdf_consistency():
    n = 4096
    p = _params(bsdf.CLOSURE_MICROFACET, alpha=0.2, n=n)
    wo = np.tile(np.asarray([0.4, -0.1, 0.91], np.float32), (n, 1))
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wi, f, pdf = bsdf.sample_local(p, wo, _rand_u2(n, seed=2))
    ok = pdf > 1e-6
    pdf2 = bsdf.pdf_local(p, wo, wi)
    np.testing.assert_allclose(pdf[ok], pdf2[ok], rtol=1e-3, atol=1e-5)


def test_microfacet_energy_bounded():
    """GGX with F=1 must not gain energy (integral f*cos <= 1)."""
    n = 1 << 15
    for alpha in (0.05, 0.2, 0.6):
        p = _params(bsdf.CLOSURE_MICROFACET, alpha=alpha, n=n)
        wo = np.tile(np.asarray([0.2, 0.1, 0.97], np.float32), (n, 1))
        wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
        wi, f, pdf = bsdf.sample_local(p, wo, _rand_u2(n, seed=3))
        ok = pdf > 1e-6
        est = np.where(
            ok[..., None], f * np.abs(wi[..., 2:3]) / np.maximum(pdf, 1e-9)[..., None], 0.0
        )
        assert est.mean(axis=0).max() <= 1.05, alpha


def test_microfacet_reciprocity():
    n = 1024
    p = _params(bsdf.CLOSURE_MICROFACET, alpha=0.3, n=n)
    r = np.random.default_rng(5)
    wo = r.normal(size=(n, 3)).astype(np.float32)
    wo[:, 2] = np.abs(wo[:, 2]) + 0.1
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wi = r.normal(size=(n, 3)).astype(np.float32)
    wi[:, 2] = np.abs(wi[:, 2]) + 0.1
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    f1 = bsdf.eval_local(p, wo, wi)
    f2 = bsdf.eval_local(p, wi, wo)
    np.testing.assert_allclose(f1, f2, rtol=1e-3, atol=1e-5)


def test_mix_material_selection():
    from akari_tpu.scene.arrays import (
        MAT_DIFFUSE,
        MAT_GLOSSY,
        MAT_MIX,
        MaterialTable,
        TextureTable,
        TEX_CONSTANT,
    )
    from akari_tpu.shading import material as m

    # material 0 = mix(frac=0.3 -> B glossy(2), A diffuse(1))
    mats = MaterialTable(
        kind=np.asarray([MAT_MIX, MAT_DIFFUSE, MAT_GLOSSY], np.int32),
        color_tex=np.asarray([0, 1, 2], np.int32),
        roughness_tex=np.asarray([0, 0, 3], np.int32),
        fraction_tex=np.asarray([4, 0, 0], np.int32),
        mix_a=np.asarray([1, 0, 0], np.int32),
        mix_b=np.asarray([2, 0, 0], np.int32),
        double_sided=np.zeros(3, bool),
        has_mix=True,
    )
    texs = TextureTable(
        kind=np.full(5, TEX_CONSTANT, np.int32),
        value=np.asarray(
            [[1, 1, 1], [0.5, 0.5, 0.5], [0.9, 0.9, 0.9], [0.2, 0.2, 0.2],
             [0.3, 0.3, 0.3]], np.float32
        ),
        image_id=np.zeros(5, np.int32),
        images=np.zeros((1, 1, 1, 3), np.float32),
        image_sizes=np.ones((1, 2), np.int32),
    )
    n = 1 << 14
    pix = np.arange(n, dtype=np.uint32)
    u = rng.uniform(0, pix, 0, 0)
    uv = np.zeros((n, 2), np.float32)
    leaf, choice_pdf = m.select_material(
        mats, texs, np.zeros(n, np.int32), u, uv
    )
    frac_b = float((leaf == 2).mean())
    assert abs(frac_b - 0.3) < 0.02
    # estimator of 1 over choices must be unbiased: E[1/choice_pdf * indicator]
    est_b = np.where(leaf == 2, choice_pdf, 0.0)
    # P(B)=0.3, choice_pdf=1/0.3 -> E[indicator/ (1/choice..)] ... check pdf values
    np.testing.assert_allclose(
        np.unique(np.round(choice_pdf[leaf == 2], 4)), [round(1 / 0.3, 4)]
    )
    np.testing.assert_allclose(
        np.unique(np.round(choice_pdf[leaf == 1], 4)), [round(1 / 0.7, 4)]
    )


def test_specular_mirror_throughput_exact():
    """Delta mirror: f * |cos| / pdf == tint exactly; eval/pdf are zero."""
    n = 64
    p = _params(bsdf.CLOSURE_SPECULAR, color=(0.8, 0.6, 0.4), n=n)
    r = np.random.default_rng(4)
    wo = r.normal(size=(n, 3)).astype(np.float32)
    wo[:, 2] = np.abs(wo[:, 2]) + 0.05
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wi, f, pdf = bsdf.sample_local(p, wo, _rand_u2(n))
    # mirror direction about z
    np.testing.assert_allclose(wi[:, 2], wo[:, 2], atol=1e-6)
    np.testing.assert_allclose(wi[:, :2], -wo[:, :2], atol=1e-6)
    thr = f * np.abs(wi[:, 2:3]) / pdf[:, None]
    np.testing.assert_allclose(thr, np.tile([0.8, 0.6, 0.4], (n, 1)), rtol=1e-4)
    assert np.all(bsdf.eval_local(p, wo, wi) == 0.0)
    assert np.all(bsdf.pdf_local(p, wo, wi) == 0.0)


def test_fresnel_terms():
    fd0 = bsdf.fresnel_dielectric(np.float32(1.0), 1.0, 1.5)
    # normal incidence: ((n1-n2)/(n1+n2))^2 = 0.04
    assert abs(float(fd0) - 0.04) < 1e-3
    fd_grazing = bsdf.fresnel_dielectric(np.float32(0.01), 1.0, 1.5)
    assert float(fd_grazing) > 0.9
    # TIR from the dense side
    tir = bsdf.fresnel_dielectric(np.float32(-0.2), 1.0, 1.5)
    assert float(tir) == 1.0
    fc = bsdf.fresnel_conductor(np.float32(1.0), np.float32(0.2), np.float32(3.0))
    assert 0.8 < float(fc) <= 1.0
    fs = bsdf.fresnel_schlick(np.float32(1.0), np.float32(0.04))
    assert abs(float(fs) - 0.04) < 1e-6


def test_mirror_render_reflects():
    """Cornell with a mirror tall box: renders finite, and the mirror region
    differs from the diffuse version (it reflects surroundings)."""
    import jax

    from akari_tpu.integrators.path import PathConfig, render
    from akari_tpu.scene.builtin import cornell_box_mesh
    from akari_tpu.scene.nodes import MirrorMaterial, compile_scene
    from akari_tpu.scene.arrays import make_camera
    from akari_tpu.core import transform as xform

    mesh_d = cornell_box_mesh()
    mesh_m = cornell_box_mesh()
    # tallBox material index: find by name order — replace the 7th (tallBox)
    mats = list(mesh_m.materials)
    mats[6] = MirrorMaterial(color=(0.95, 0.95, 0.95))
    mesh_m.materials = mats
    cam = make_camera(xform.translate((0, 1, 9)), 15.0, 24, 24)
    cfg = PathConfig(spp=8, max_depth=3)
    img_d = np.asarray(render(compile_scene([mesh_d], "bvh"), cam, cfg, seed=0))
    img_m = np.asarray(render(compile_scene([mesh_m], "bvh"), cam, cfg, seed=0))
    assert np.all(np.isfinite(img_m))
    diff = np.abs(img_m - img_d).mean()
    assert diff > 0.003, diff
