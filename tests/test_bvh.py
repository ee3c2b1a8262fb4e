"""BVH build + traversal: structural invariants and brute-force equivalence."""

import numpy as np
import jax.numpy as jnp

from akari_tpu.bvh.build import MAX_LEAF, build_bvh
from akari_tpu.scene.builtin import cornell_box
from akari_tpu.ops.intersect import intersect, occlude


def _orig_prim(scene, hit):
    """Map storage prim ids to original triangle ids (copy-invariant)."""
    prim = np.asarray(hit.prim)
    mapped = np.asarray(scene.prim_to_orig)[np.maximum(prim, 0)]
    return np.where(np.asarray(hit.valid), mapped, -1)


def _random_tris(n, seed=0):
    r = np.random.default_rng(seed)
    base = r.uniform(-2, 2, size=(n, 1, 3))
    corners = base + r.normal(scale=0.3, size=(n, 3, 3))
    return corners.astype(np.float32)


def test_build_invariants():
    tris = _random_tris(500)
    bvh, order = build_bvh(tris[:, 0], tris[:, 1], tris[:, 2])
    n = bvh["first"].shape[0]
    # SBVH spatial splits may duplicate references: order covers every
    # triangle at least once, and is bounded by the duplication budget.
    assert sorted(set(order.tolist())) == list(range(500))
    assert 500 <= len(order) <= 500 + int(0.35 * 500) + 1
    leaf = bvh["count"] > 0
    # all storage slots covered exactly once by leaves
    covered = []
    for i in np.nonzero(leaf)[0]:
        covered.extend(range(bvh["first"][i], bvh["first"][i] + bvh["count"][i]))
    assert sorted(covered) == list(range(len(order)))
    assert bvh["count"].max() <= MAX_LEAF
    # miss links in range
    assert np.all(bvh["miss"] >= -1) and np.all(bvh["miss"] < n)
    # bounds sane
    assert np.all(bvh["node_lo"] <= bvh["node_hi"])


def test_traversal_matches_brute():
    import jax

    scene = cornell_box(32, 32).compile(intersector="bvh")
    scene_brute = cornell_box(32, 32).compile(intersector="brute")
    r = np.random.default_rng(3)
    n = 512
    o = np.asarray([0.0, 1.0, 4.0], np.float32) + r.normal(
        scale=0.2, size=(n, 3)
    ).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)

    h_bvh = intersect(scene, jnp.asarray(o), jnp.asarray(d))
    h_brute = intersect(scene_brute, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(h_bvh.valid), np.asarray(h_brute.valid))
    np.testing.assert_array_equal(
        _orig_prim(scene, h_bvh), _orig_prim(scene_brute, h_brute)
    )
    np.testing.assert_allclose(
        np.asarray(h_bvh.t), np.asarray(h_brute.t), rtol=1e-5, atol=1e-5
    )

    occ_bvh = occlude(scene, jnp.asarray(o), jnp.asarray(d), 0.0, 1e30)
    occ_brute = occlude(scene_brute, jnp.asarray(o), jnp.asarray(d), 0.0, 1e30)
    np.testing.assert_array_equal(np.asarray(occ_bvh), np.asarray(occ_brute))


def test_traversal_random_scene():
    from akari_tpu.scene.nodes import Mesh, compile_scene

    tris = _random_tris(300, seed=7)
    verts = tris.reshape(-1, 3)
    idx = np.arange(verts.shape[0]).reshape(-1, 3)
    mesh = Mesh(vertices=verts, indices=idx)
    scene = compile_scene([mesh], intersector="bvh")
    scene_b = compile_scene([mesh], intersector="brute")

    r = np.random.default_rng(11)
    n = 512
    o = r.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h1 = intersect(scene, jnp.asarray(o), jnp.asarray(d))
    h2 = intersect(scene_b, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(_orig_prim(scene, h1), _orig_prim(scene_b, h2))
    np.testing.assert_allclose(
        np.asarray(h1.t), np.asarray(h2.t), rtol=1e-5, atol=1e-5
    )
