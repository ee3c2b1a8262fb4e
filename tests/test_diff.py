"""Differentiability tests: finite-difference gradient checks on albedo and
emitter radiance (BASELINE: pixel gradients allclose; config 4 recovery)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from akari_tpu.diff.inverse import apply_params, scene_params
from akari_tpu.integrators.path import PathConfig, render
from akari_tpu.parallel.mesh import make_ray_mesh
from akari_tpu.parallel.render import loss_and_image_sharded
from akari_tpu.scene.builtin import cornell_box


@pytest.fixture(scope="module")
def setup():
    sc = cornell_box(12, 12)
    scene = sc.compile(intersector="bvh")
    return sc, scene


def _loss_of_params(scene, cam, cfg, target):
    def f(params):
        s = apply_params(scene, params)
        img = render(s, cam, cfg, seed=0)
        return jnp.mean((img - target) ** 2)

    return f


def test_albedo_and_emission_finite_difference(setup):
    """d loss / d texture values matches central differences.

    The same MC sample stream is used for every evaluation (fixed seed), so
    the FD of the *estimator* is well-defined and smooth in texture params
    (visibility is detached and unchanged by texture perturbations).
    """
    sc, scene = setup
    cfg = PathConfig(spp=2, max_depth=2, mis=True)
    target = jnp.zeros((12, 12, 3), jnp.float32)
    f = jax.jit(_loss_of_params(scene, sc.camera, cfg, target))
    params = scene_params(scene)
    g = jax.jit(jax.grad(f))(params)["tex_value"]
    g = np.asarray(g)

    v0 = np.asarray(params["tex_value"])
    # probe a handful of (texture, channel) coordinates incl. the emitter
    # (tex0 is the emissive light color in the cornell compile order)
    probes = [(0, 0), (0, 2), (1, 0), (3, 0), (5, 0), (5, 2), (7, 0)]
    checked = 0
    for i, c in probes:
        eps = 1e-2 * max(abs(v0[i, c]), 1.0)
        vp = v0.copy()
        vp[i, c] += eps
        vm = v0.copy()
        vm[i, c] -= eps
        fp = float(f({"tex_value": jnp.asarray(vp)}))
        fm = float(f({"tex_value": jnp.asarray(vm)}))
        fd = (fp - fm) / (2 * eps)
        ad = float(g[i, c])
        # f32 renders give loss precision ~1e-7; central differences with
        # eps~1e-2 therefore carry ~5e-6 absolute noise. Only gradients
        # clearly above that floor are comparable.
        if abs(fd) < 1e-4 or abs(ad) < 1e-4:
            continue
        assert abs(fd - ad) <= 0.05 * max(abs(fd), abs(ad)) + 1e-6, (
            f"tex {i} ch {c}: fd={fd} ad={ad}"
        )
        checked += 1
    assert checked >= 3  # must have verified some nonzero gradients


@pytest.mark.slow
def test_inverse_rendering_recovers_albedo():
    """Corrupt the wall albedos, re-fit on the rendered target via the
    sharded Adam loop (BASELINE config 4, abbreviated for CI; the full
    high-res Cornell run is recorded in gallery/recovery_r4.md)."""
    import dataclasses

    from akari_tpu.diff.inverse import InverseConfig, inverse_render
    from akari_tpu.scene.arrays import MAT_EMISSIVE

    sc = cornell_box(16, 16)
    scene = sc.compile(intersector="bvh")
    cfg = PathConfig(spp=4, max_depth=2, mis=True)
    mesh = make_ray_mesh(n_devices=2)
    # ground-truth image from the true scene
    _, target = loss_and_image_sharded(
        scene, sc.camera, cfg, mesh, jnp.zeros((16, 16, 3)), seed=123
    )
    target = jax.lax.stop_gradient(target)

    # corrupt the non-emissive (albedo/roughness) textures only: corrupting
    # the emitter too makes the tiny-scale problem nearly scale-ambiguous
    em_tex = np.zeros(scene.textures.value.shape[0], bool)
    em_tex[
        np.asarray(scene.materials.color_tex)[
            np.asarray(scene.materials.kind) == MAT_EMISSIVE
        ]
    ] = True
    bad_v = np.where(em_tex[:, None], scene.textures.value,
                     scene.textures.value * 0.4)
    bad = dataclasses.replace(
        scene, textures=dataclasses.replace(scene.textures, value=bad_v)
    )
    loss0, _ = loss_and_image_sharded(bad, sc.camera, cfg, mesh, target, seed=123)

    recovered, losses, _ = inverse_render(
        bad, sc.camera, cfg, target, mesh,
        InverseConfig(iterations=60, learning_rate=0.05, seed=123),
    )
    # evaluate on the same seed as loss0 (per-iteration losses use fresh
    # seeds and are MC-noisy)
    loss_end, _ = loss_and_image_sharded(
        recovered, sc.camera, cfg, mesh, target, seed=123
    )
    assert float(loss_end) < 0.5 * float(loss0), (float(loss0), float(loss_end))
    # recovered albedos move toward truth
    true_v = np.asarray(scene.textures.value)
    rec_v = np.asarray(recovered.textures.value)
    alb = ~em_tex
    err_bad = np.abs(bad_v[alb] - true_v[alb]).sum()
    err_rec = np.abs(rec_v[alb] - true_v[alb]).sum()
    assert err_rec < err_bad, (err_bad, err_rec)


@pytest.mark.slow
def test_geometry_gradient_finite_difference():
    """Vertex-position gradients (VERDICT r2 item 4; the reference's
    autodiff.h is an empty stub): translate the light quad vertically and
    compare AD through the interior (reparameterized-barycentric,
    detached-hit) term — exposed as ``tri_delta`` by diff/inverse.py —
    against central finite differences of host-recompiled scenes.

    The room is occlusion-free (walls + floating light, no boxes) and the
    emitter's directly-visible rows are masked from the loss, so visibility
    is constant in the light height and the interior term IS the full
    derivative. Silhouette/edge terms are detached by design
    (ops/intersect.py) and out of scope here."""
    from akari_tpu.scene.arrays import MAT_EMISSIVE
    from akari_tpu.scene.builtin import _cornell_box_fallback, cornell_box
    from akari_tpu.scene.nodes import EmissiveMaterial, compile_scene

    def build_scene(dy):
        mesh = _cornell_box_fallback()
        em = [i for i, m in enumerate(mesh.materials)
              if isinstance(m, EmissiveMaterial)]
        faces = np.isin(np.asarray(mesh.material_ids), em)
        vids = np.unique(np.asarray(mesh.indices)[faces])
        verts = np.asarray(mesh.vertices, np.float32).copy()
        verts[vids, 1] += dy
        mesh.vertices = verts
        return compile_scene([mesh], intersector="bvh")

    res = 32
    cfg = PathConfig(spp=8, max_depth=2, mis=True)
    cam = cornell_box(res, res).camera
    cut = int(0.45 * res)
    base = -0.12  # light lowered clear of the ceiling

    def loss_of_scene(scene):
        img = render(scene, cam, cfg, seed=0)
        return jnp.mean(img[cut:])

    scene0 = build_scene(base)
    em_mask = (
        np.asarray(scene0.materials.kind)[np.asarray(scene0.mat_id)]
        == MAT_EMISSIVE
    )

    def loss_ad(dy):
        delta = jnp.where(
            jnp.asarray(em_mask)[:, None], jnp.array([0.0, 1.0, 0.0]) * dy, 0.0
        )
        params = {"tex_value": jnp.asarray(scene0.textures.value),
                  "tri_delta": delta}
        return loss_of_scene(apply_params(scene0, params))

    ad = float(jax.jit(jax.grad(loss_ad))(0.0))
    h = 0.02
    fd = (
        float(loss_of_scene(build_scene(base + h)))
        - float(loss_of_scene(build_scene(base - h)))
    ) / (2 * h)
    assert abs(ad) > 1e-3  # a real, nonzero geometric derivative
    assert abs(fd - ad) <= 0.05 * max(abs(fd), abs(ad)), (fd, ad)


def test_gradients_match_oracle_finite_difference(setup):
    """BASELINE's literal claim: pixel-loss gradients from the TPU-path AD
    match finite differences of the *NumPy oracle renderer* on matched
    sampler seeds (the oracle never touches JAX's AD or XLA)."""
    import dataclasses

    from akari_tpu.oracle.renderer import render_oracle

    sc, scene = setup
    cfg = PathConfig(spp=2, max_depth=2, mis=True)
    target = np.zeros((12, 12, 3), np.float32)

    f = jax.jit(_loss_of_params(scene, sc.camera, cfg, jnp.asarray(target)))
    params = scene_params(scene)
    g = np.asarray(jax.jit(jax.grad(f))(params)["tex_value"])

    def oracle_loss(tex_value):
        s = dataclasses.replace(
            scene, textures=dataclasses.replace(
                scene.textures, value=tex_value
            )
        )
        img = render_oracle(s, sc.camera, cfg, seed=0)
        return float(np.mean((img - target) ** 2))

    v0 = np.asarray(params["tex_value"])
    checked = 0
    for (i, c) in [(0, 0), (3, 0), (5, 0)]:
        eps = 1e-2 * max(abs(v0[i, c]), 1.0)
        vp = v0.copy(); vp[i, c] += eps
        vm = v0.copy(); vm[i, c] -= eps
        fd = (oracle_loss(vp) - oracle_loss(vm)) / (2 * eps)
        ad = float(g[i, c])
        if abs(fd) < 1e-4 or abs(ad) < 1e-4:
            continue
        assert abs(fd - ad) <= 0.05 * max(abs(fd), abs(ad)) + 1e-6, (i, c, fd, ad)
        checked += 1
    assert checked >= 2
