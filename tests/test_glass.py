"""Smooth-dielectric (glass) closure: Fresnel split, Snell refraction,
energy closure, oracle parity.

Completes the reference's declared-but-unused dielectric surface
(ref: src/akari/kernel/bsdf-funcs.h fr_dielectric/refract exist; no
reference closure consumes them).
"""

import numpy as np
import jax.numpy as jnp

from akari_tpu.core import transform as xform
from akari_tpu.core.v3 import V3
from akari_tpu.integrators.path import PathConfig, render
from akari_tpu.scene.arrays import make_camera
from akari_tpu.scene.nodes import (
    DiffuseMaterial, EmissiveMaterial, EnvMapLight, GlassMaterial, Mesh,
    Scene,
)
from akari_tpu.shading import soa


def _quad(center, half, normal_axis, mat, flip=False):
    c = np.asarray(center, np.float32)
    axes = {"y": ((1, 0, 0), (0, 0, -1)), "z": ((1, 0, 0), (0, 1, 0))}
    u, v = (np.asarray(a, np.float32) * half for a in axes[normal_axis])
    verts = np.stack([c - u - v, c + u - v, c + u + v, c - u + v])
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    if flip:
        faces = faces[:, ::-1]
    return Mesh(vertices=verts, indices=faces, materials=[mat])


def _glass_slab(z0=0.9, z1=1.1, half=3.0, ior=1.5):
    """Closed slab: front interface (+z outward) and back (-z outward).
    Two interfaces cancel the per-interface (1/eta)^2 radiance scale, so
    classical slab formulas apply."""
    m = GlassMaterial(ior=ior)
    front = _quad((0, 0, z1), half, "z", m)
    back = _quad((0, 0, z0), half, "z", m, flip=True)
    return [front, back]


def test_glass_pane_transmission_normal_incidence():
    """Camera looks straight through a glass SLAB at an emissive backdrop:
    at normal incidence each interface reflects F = ((n-1)/(n+1))^2 =
    0.04; with internal bounces the slab transmittance is (1-F)/(1+F)
    ~ 0.9231 for n=1.5."""
    Le = 5.0
    glass = _glass_slab()
    # backdrop normal faces +z (toward the camera)
    back = _quad((0, 0, -1.0), 8.0, "z", EmissiveMaterial((Le,) * 3))
    cam = make_camera(xform.translate((0.0, 0.0, 4.0)), 10, 16, 16)
    sc = Scene(shapes=glass + [back], camera=cam)
    scene = sc.compile(intersector="bvh")
    img = np.asarray(
        render(scene, cam, PathConfig(spp=256, max_depth=6, mis="bsdf",
                                      ray_clamp=0.0), seed=0)
    )
    t_slab = (1 - 0.04) / (1 + 0.04)
    got = img.mean() / Le
    assert abs(got - t_slab) < 0.02, (got, t_slab)


def test_glass_snell_refraction_direction():
    """sample_local with u below the Fresnel threshold refracts; the
    transmitted angle obeys Snell's law."""
    n1 = 64
    theta_i = np.radians(40.0)
    wo = V3(
        np.full(n1, np.sin(theta_i), np.float32),
        np.zeros(n1, np.float32),
        np.full(n1, np.cos(theta_i), np.float32),
    )
    ior = np.full(n1, 1.5, np.float32)
    color = V3(*(np.ones(n1, np.float32),) * 3)
    # u1 = 0.99 > F(40deg, 1.5) ~ 0.046 -> refraction branch
    wi, f, pdf = soa._glass_sample(color, ior, wo, np.full(n1, 0.99, np.float32))
    sin_t = np.sin(theta_i) / 1.5
    np.testing.assert_allclose(np.asarray(wi.x), -sin_t, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(wi.z), -np.sqrt(1 - sin_t**2), atol=1e-5
    )
    # u1 = 0.001 < F -> mirror reflection
    wi_r, _, _ = soa._glass_sample(color, ior, wo, np.full(n1, 0.001, np.float32))
    np.testing.assert_allclose(np.asarray(wi_r.z), np.cos(theta_i), atol=1e-6)
    # total internal reflection from inside beyond the critical angle
    theta_c = np.arcsin(1 / 1.5)
    wo_in = V3(
        np.full(n1, np.sin(theta_c + 0.1), np.float32),
        np.zeros(n1, np.float32),
        np.full(n1, -np.cos(theta_c + 0.1), np.float32),
    )
    wi_t, _, _ = soa._glass_sample(color, ior, wo_in, np.full(n1, 0.999, np.float32))
    np.testing.assert_allclose(np.asarray(wi_t.z), np.asarray(wo_in.z),
                               atol=1e-6)  # reflected (TIR)


def test_glass_furnace_energy():
    """A closed glass slab inside a uniform-sky furnace: the slab neither
    absorbs nor emits and the two interfaces cancel the per-interface
    radiance scale, so every pixel stays Le (truncated multi-bounce
    terms cost < 1%)."""
    Le = 0.7
    env = EnvMapLight(np.full((8, 16, 3), Le, np.float32))
    m = GlassMaterial(ior=1.5)
    top = _quad((0, 0.6, 0), 1.5, "y", m)
    bottom = _quad((0, 0.4, 0), 1.5, "y", m, flip=True)
    cam = make_camera(
        xform.translate((0.0, 2.5, 0.0)) @ xform.rotate_x(np.radians(-90.0)),
        25, 12, 12,
    )
    sc = Scene(shapes=[top, bottom], camera=cam, environment=env)
    scene = sc.compile(intersector="bvh")
    img = np.asarray(
        render(scene, cam, PathConfig(spp=64, max_depth=8, mis="bsdf",
                                      ray_clamp=0.0), seed=0)
    )
    np.testing.assert_allclose(img.mean(), Le, rtol=0.01)


def test_glass_oracle_parity():
    from akari_tpu.oracle.renderer import render_oracle

    glass = _quad((0, 0, 1.0), 2.0, "z", GlassMaterial(ior=1.4))
    floor = _quad((0, -1.0, 0), 6.0, "y", DiffuseMaterial((0.6,) * 3))
    light = _quad((0, 3.0, 0), 1.0, "y", EmissiveMaterial((8.0,) * 3), flip=True)
    cam = make_camera(xform.translate((0.0, 0.3, 4.0)), 35, 8, 8)
    sc = Scene(shapes=[glass, floor, light], camera=cam)
    scene = sc.compile(intersector="brute")
    cfg = PathConfig(spp=4, max_depth=4, ray_clamp=0.0)
    img_j = np.asarray(render(scene, cam, cfg, seed=0))
    img_o = render_oracle(scene, cam, cfg, seed=0)
    np.testing.assert_allclose(img_j, img_o, rtol=3e-4, atol=3e-5)


def test_glass_sdl_node(tmp_path):
    from akari_tpu.scene import sdl

    f = tmp_path / "g.akari"
    f.write_text(
        'export scene = Scene {\n'
        '  camera: PerspectiveCamera { resolution: [4, 4] },\n'
        '  shapes: [],\n'
        '}\n'
        'export mat = GlassMaterial { ior: 1.33, color: [0.9, 0.95, 1.0] }\n'
    )
    module = sdl.parse_file(str(f))
    m = module.exports["mat"]
    assert abs(m.ior - 1.33) < 1e-6


def test_glass_mtl_import(tmp_path):
    """MTL illum 4/6/7 + Ni translate to GlassMaterial through the
    importer round trip (extension past the reference importer)."""
    from akari_tpu.scene.obj import load_obj

    (tmp_path / "m.mtl").write_text(
        "newmtl win\nKd 1 1 1\nNi 1.45\nillum 7\n"
        "newmtl wall\nKd 0.5 0.5 0.5\nillum 2\n"
    )
    (tmp_path / "m.obj").write_text(
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "usemtl win\nf 1 2 3\nusemtl wall\nf 3 2 1\n"
    )
    mesh = load_obj(str(tmp_path / "m.obj"))
    kinds = {type(m).__name__ for m in mesh.materials}
    assert "GlassMaterial" in kinds and "DiffuseMaterial" in kinds
    g = [m for m in mesh.materials if type(m).__name__ == "GlassMaterial"][0]
    assert abs(g.ior - 1.45) < 1e-6

    from akari_tpu.cli.importer import _mat_to_sdl

    sdl_txt = _mat_to_sdl("win", g, str(tmp_path))
    assert "GlassMaterial" in sdl_txt and "1.45" in sdl_txt
