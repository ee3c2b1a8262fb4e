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


import os


@pytest.mark.skipif(
    os.environ.get("AKARI_SLOW_TESTS") != "1",
    reason="~5 min optimization loop on a 2-vCPU box; the FD gradient test "
    "above covers gradient correctness. Set AKARI_SLOW_TESTS=1 to run.",
)
def test_inverse_rendering_recovers_albedo(setup):
    """Perturb wall albedos + emitter, re-fit on the rendered target."""
    import dataclasses

    from akari_tpu.diff.inverse import InverseConfig, inverse_render

    sc, scene = setup
    cfg = PathConfig(spp=2, max_depth=2, mis=True)
    mesh = make_ray_mesh(n_devices=4)
    target, _ = None, None
    # ground-truth image from the true scene
    _, target = loss_and_image_sharded(
        scene, sc.camera, cfg, mesh, jnp.zeros((12, 12, 3)), seed=123
    )
    target = jax.lax.stop_gradient(target)

    # corrupt: scale all texture values down
    bad = dataclasses.replace(
        scene,
        textures=dataclasses.replace(
            scene.textures, value=scene.textures.value * 0.4
        ),
    )
    loss0, _ = loss_and_image_sharded(bad, sc.camera, cfg, mesh, target, seed=123)

    recovered, losses, _ = inverse_render(
        bad, sc.camera, cfg, target, mesh,
        InverseConfig(iterations=40, learning_rate=0.1, seed=123),
    )
    assert losses[-1] < 0.2 * float(loss0), (losses[0], losses[-1])
    # recovered emitter radiance should move toward truth (17,12,4)
    true_v = np.asarray(scene.textures.value)
    rec_v = np.asarray(recovered.textures.value)
    bad_v = true_v * 0.4
    err_bad = np.abs(bad_v - true_v).sum()
    err_rec = np.abs(rec_v - true_v).sum()
    assert err_rec < err_bad


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
