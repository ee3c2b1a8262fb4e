"""End-to-end render tests: JAX (TPU path) vs NumPy oracle on matched seeds,
BVH vs brute-force equivalence, and basic physical sanity (white furnace).
"""

import numpy as np
import jax
import jax.numpy as jnp

from akari_tpu.integrators.path import PathConfig, render
from akari_tpu.oracle.renderer import render_oracle
from akari_tpu.scene.builtin import cornell_box


def _small_scene(intersector="brute", res=24):
    sc = cornell_box(res, res)
    return sc.compile(intersector=intersector), sc.camera


def test_jax_matches_oracle_matched_seeds():
    """BASELINE north-star correctness: allclose images on matched seeds."""
    cfg = PathConfig(spp=2, max_depth=3, mis=True)
    scene, cam = _small_scene("brute")
    img_jax = np.asarray(jax.jit(render, static_argnums=(2, 3))(scene, cam, cfg, 0))
    img_orc = render_oracle(scene, cam, cfg, seed=0)
    assert img_jax.shape == img_orc.shape
    np.testing.assert_allclose(img_jax, img_orc, rtol=1e-3, atol=2e-3)


def test_bvh_matches_brute_render():
    cfg = PathConfig(spp=2, max_depth=3, mis=True)
    scene_b, cam = _small_scene("brute")
    scene_v, _ = _small_scene("bvh")
    img_b = np.asarray(render(scene_b, cam, cfg, seed=0))
    img_v = np.asarray(render(scene_v, cam, cfg, seed=0))
    np.testing.assert_allclose(img_b, img_v, rtol=1e-4, atol=1e-4)


def test_nee_only_mode_matches_oracle():
    """mis=False reproduces the reference's NEE-only estimator path."""
    cfg = PathConfig(spp=2, max_depth=2, mis=False)
    scene, cam = _small_scene("brute")
    img_jax = np.asarray(render(scene, cam, cfg, seed=1))
    img_orc = render_oracle(scene, cam, cfg, seed=1)
    np.testing.assert_allclose(img_jax, img_orc, rtol=1e-3, atol=2e-3)


def test_render_nontrivial_and_finite():
    cfg = PathConfig(spp=2, max_depth=3)
    scene, cam = _small_scene("bvh")
    img = np.asarray(render(scene, cam, cfg, seed=0))
    assert np.all(np.isfinite(img))
    assert float(img.mean()) > 0.01  # light reaches the film
    # red wall on the left, green on the right (row through the middle)
    mid = img[img.shape[0] // 2]
    left, right = mid[1], mid[-2]
    assert left[0] > left[1]    # left wall reddish
    assert right[1] > right[0]  # right wall greenish


def test_mis_and_nee_converge_to_same_image():
    """Both estimators are unbiased: with enough samples they agree."""
    scene, cam = _small_scene("brute", res=12)
    img_mis = np.asarray(
        render(scene, cam, PathConfig(spp=64, max_depth=2, mis=True), seed=3)
    )
    img_nee = np.asarray(
        render(scene, cam, PathConfig(spp=64, max_depth=2, mis=False), seed=4)
    )
    # agreement in the mean (loose MC tolerance)
    assert abs(float(img_mis.mean() - img_nee.mean())) < 0.05 * max(
        float(img_mis.mean()), 1e-3
    ) + 0.02
