"""Pallas kernel tests (interpreter mode on CPU; the same kernels are
validated compiled on real TPU hardware — see .claude/skills/verify)."""

import numpy as np
import jax.numpy as jnp
import pytest

import akari_tpu.ops.pallas_intersect as pi
from akari_tpu.ops.intersect import intersect, occlude
from akari_tpu.scene.builtin import cornell_box


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pi.INTERPRET
    pi.INTERPRET = True
    yield
    pi.INTERPRET = old


def _orig_prim(scene, hit):
    """Storage prim ids -> original triangle ids (SBVH copies collapse)."""
    prim = np.asarray(hit.prim)
    mapped = np.asarray(scene.prim_to_orig)[np.maximum(prim, 0)]
    return np.where(np.asarray(hit.valid), mapped, -1)


def _rays(n, seed=3):
    r = np.random.default_rng(seed)
    o = np.asarray([0.0, 1.0, 4.0], np.float32) + r.normal(
        scale=0.2, size=(n, 3)
    ).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_pallas_matches_brute():
    scene_p = cornell_box(16, 16).compile(intersector="pallas")
    scene_b = cornell_box(16, 16).compile(intersector="brute")
    o, d = _rays(300)
    hp = intersect(scene_p, o, d)
    hb = intersect(scene_b, o, d)
    np.testing.assert_array_equal(np.asarray(hp.valid), np.asarray(hb.valid))
    np.testing.assert_array_equal(_orig_prim(scene_p, hp), _orig_prim(scene_b, hb))
    ok = np.asarray(hb.valid)
    np.testing.assert_allclose(
        np.asarray(hp.t)[ok], np.asarray(hb.t)[ok], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(hp.uv)[ok], np.asarray(hb.uv)[ok], rtol=1e-4, atol=1e-5
    )


def test_pallas_occlude_matches_brute():
    scene_p = cornell_box(16, 16).compile(intersector="pallas")
    scene_b = cornell_box(16, 16).compile(intersector="brute")
    o, d = _rays(300, seed=5)
    op = occlude(scene_p, o, d, 0.0, 1e30)
    ob = occlude(scene_b, o, d, 0.0, 1e30)
    np.testing.assert_array_equal(np.asarray(op), np.asarray(ob))


def test_pallas_closest_honors_t_max():
    """Regression: closest-hit must not report hits beyond per-ray t_max —
    the fused shadow+extension launch (integrators/path.py) reads
    ``h.valid`` of a t_max-bounded query as the occlusion answer."""
    scene_p = cornell_box(16, 16).compile(intersector="pallas")
    scene_b = cornell_box(16, 16).compile(intersector="brute")
    o, d = _rays(300, seed=7)
    hb = intersect(scene_b, o, d)
    t_ref = np.asarray(hb.t)
    valid_ref = np.asarray(hb.valid)
    # cut half the rays short of their own hit distance
    t_max = np.where(
        np.arange(300) % 2 == 0, t_ref * 0.5, np.full(300, 1e30)
    ).astype(np.float32)
    hp = intersect(scene_p, o, d, t_max=jnp.asarray(t_max))
    hb2 = intersect(scene_b, o, d, t_max=jnp.asarray(t_max))
    np.testing.assert_array_equal(
        np.asarray(hp.valid), np.asarray(hb2.valid)
    )
    # even-index valid rays must now be misses
    assert not np.any(np.asarray(hp.valid)[::2] & valid_ref[::2])


def test_pallas_ray_padding():
    """Non-multiple-of-128 ray counts are padded with never-hit rays."""
    scene_p = cornell_box(16, 16).compile(intersector="pallas")
    o, d = _rays(77)
    h = intersect(scene_p, o, d)
    assert h.t.shape == (77,)


def test_cluster_hierarchy_matches_bvh():
    """The hierarchical supercluster-skip kernel (scenes > DENSE_MAX_TRIS)
    must agree with the XLA threaded-BVH backend on a ~8k-tri mesh that
    spans two superclusters (exercises descent, the cluster-index guard,
    and best-t pruning)."""
    from akari_tpu.ops.pallas_intersect import DENSE_MAX_TRIS
    from akari_tpu.scene.builtin import terrain_scene

    sc = terrain_scene(16, 16, n=64)
    scene_p = sc.compile(intersector="pallas")
    assert scene_p.n_tris > DENSE_MAX_TRIS  # really the cluster path
    assert scene_p.tri_superclusters.shape[0] >= 2
    scene_b = sc.compile(intersector="bvh")
    r = np.random.default_rng(11)
    o = np.asarray([0.0, 1.5, 1.5], np.float32) + r.normal(
        scale=0.3, size=(160, 3)
    ).astype(np.float32)
    d = r.normal(size=(160, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    hp = intersect(scene_p, o, d)
    hb = intersect(scene_b, o, d)
    np.testing.assert_array_equal(np.asarray(hp.valid), np.asarray(hb.valid))
    ok = np.asarray(hb.valid)
    np.testing.assert_allclose(
        np.asarray(hp.t)[ok], np.asarray(hb.t)[ok], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(
        _orig_prim(scene_p, hp)[ok], _orig_prim(scene_b, hb)[ok]
    )
    # occlusion agrees too
    op = occlude(scene_p, o, d, 0.0, 1e30)
    np.testing.assert_array_equal(np.asarray(op), np.asarray(hb.valid))


def test_native_bvh_builder_matches_python():
    from akari_tpu.bvh.build import MAX_LEAF, build_bvh
    from akari_tpu.native.loader import native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    r = np.random.default_rng(0)
    n = 5000
    base = r.uniform(-5, 5, size=(n, 1, 3))
    tris = (base + r.normal(scale=0.2, size=(n, 3, 3))).astype(np.float32)
    bvh, order = build_bvh(tris[:, 0], tris[:, 1], tris[:, 2], use_native=True)
    # invariants
    leaf = bvh["count"] > 0
    covered = np.concatenate(
        [np.arange(f, f + c) for f, c in zip(bvh["first"][leaf], bvh["count"][leaf])]
    )
    assert sorted(covered.tolist()) == list(range(n))
    assert bvh["count"].max() <= MAX_LEAF
    assert sorted(order.tolist()) == list(range(n))
    m = bvh["first"].shape[0]
    assert bvh["miss"].min() >= -1 and bvh["miss"].max() < m
    assert np.all(bvh["node_lo"] <= bvh["node_hi"])

    # traversal over the native-built BVH matches brute force
    import jax.numpy as jnp

    from akari_tpu.ops.intersect import intersect
    from akari_tpu.scene.nodes import Mesh, compile_scene

    verts = tris.reshape(-1, 3)
    idx = np.arange(verts.shape[0]).reshape(-1, 3)
    mesh = Mesh(vertices=verts, indices=idx)
    # compile_scene uses auto selection; force a small scene through native
    import akari_tpu.scene.nodes as nodes_mod

    orig = nodes_mod.build_bvh
    try:
        nodes_mod.build_bvh = lambda p0, p1, p2: orig(p0, p1, p2, use_native=True)
        scene_n = compile_scene([mesh], intersector="bvh")
    finally:
        nodes_mod.build_bvh = orig
    scene_b = compile_scene([mesh], intersector="brute")
    rr = np.random.default_rng(1)
    o = jnp.asarray(rr.uniform(-6, 6, size=(256, 3)).astype(np.float32))
    d = rr.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    hn = intersect(scene_n, o, d)
    hb = intersect(scene_b, o, d)
    # native and python builders order triangles differently, so compare
    # hit distances + validity (prim ids live in different permutations)
    np.testing.assert_array_equal(np.asarray(hn.valid), np.asarray(hb.valid))
    np.testing.assert_allclose(
        np.asarray(hn.t), np.asarray(hb.t), rtol=1e-5, atol=1e-4
    )


def _random_tri_scene(n_tri, seed=9, spread=4, size=0.15):
    from akari_tpu.scene.nodes import Mesh

    r = np.random.default_rng(seed)
    base = r.uniform(-spread, spread, size=(n_tri, 1, 3))
    tris = (base + r.normal(scale=size, size=(n_tri, 3, 3))).astype(np.float32)
    verts = tris.reshape(-1, 3)
    idx = np.arange(verts.shape[0]).reshape(-1, 3)
    return Mesh(vertices=verts, indices=idx)


def _random_rays(nr, seed=2, spread=5):
    rr = np.random.default_rng(seed)
    o = jnp.asarray(rr.uniform(-spread, spread, size=(nr, 3)).astype(np.float32))
    d = rr.normal(size=(nr, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


def _assert_hits_match(scene_p, hp, hb, atol=1e-5):
    np.testing.assert_array_equal(np.asarray(hp.valid), np.asarray(hb.valid))
    np.testing.assert_array_equal(_orig_prim(scene_p, hp), _orig_prim(scene_p, hb))
    ok = np.asarray(hb.valid)
    np.testing.assert_allclose(
        np.asarray(hp.t)[ok], np.asarray(hb.t)[ok], rtol=1e-5, atol=atol
    )


def test_tree_kernel_matches_brute():
    """Ordered BVH2 tree walk (interpret mode) vs brute force."""
    from akari_tpu.scene.nodes import compile_scene

    mesh = _random_tri_scene(6000, seed=13)
    scene_p = compile_scene([mesh], intersector="pallas")
    assert scene_p.tri_tree is not None  # really the tree path
    scene_b = compile_scene([mesh], intersector="brute")
    o, d = _random_rays(256, seed=4)
    _assert_hits_match(scene_p, intersect(scene_p, o, d), intersect(scene_b, o, d))
    op = occlude(scene_p, o, d, 0.0, 1e30)
    ob = occlude(scene_b, o, d, 0.0, 1e30)
    np.testing.assert_array_equal(np.asarray(op), np.asarray(ob))


def test_tree_kernel_leaf_span_and_t_max():
    """leaf_span > 1 leaves (multi-cluster DMA + real-count guard) and
    bounded closest-hit queries (the fused shadow+extension contract)."""
    import dataclasses

    from akari_tpu.ops.pallas_tree import build_cluster_tree
    from akari_tpu.scene.nodes import compile_scene

    mesh = _random_tri_scene(9000, seed=17)
    scene_p = compile_scene([mesh], intersector="pallas")
    tree2, span2 = build_cluster_tree(
        scene_p.tri_clusters, scene_p.n_tris, leaf_span=2
    )
    scene_2 = dataclasses.replace(scene_p, tri_tree=tree2, tree_leaf_span=span2)
    scene_b = compile_scene([mesh], intersector="brute")
    o, d = _random_rays(160, seed=6)
    hb = intersect(scene_b, o, d)
    _assert_hits_match(scene_2, intersect(scene_2, o, d), hb)
    # bounded query: cut half the rays short of their own hit
    t_ref = np.asarray(hb.t)
    t_max = np.where(
        np.arange(160) % 2 == 0, t_ref * 0.5, np.full(160, 1e30)
    ).astype(np.float32)
    h2 = intersect(scene_2, o, d, t_max=jnp.asarray(t_max))
    hb2 = intersect(scene_b, o, d, t_max=jnp.asarray(t_max))
    np.testing.assert_array_equal(np.asarray(h2.valid), np.asarray(hb2.valid))


def test_cluster_kernel_matches_brute():
    """Linear cluster-skip kernel (interpret mode) vs brute force —
    still the instanced BLAS walk, so keep it covered on flat scenes by
    nulling the tree table."""
    import dataclasses

    from akari_tpu.scene.nodes import Mesh, compile_scene

    r = np.random.default_rng(9)
    n_tri = 6000  # > DENSE_MAX_TRIS -> clustered path
    base = r.uniform(-4, 4, size=(n_tri, 1, 3))
    tris = (base + r.normal(scale=0.15, size=(n_tri, 3, 3))).astype(np.float32)
    verts = tris.reshape(-1, 3)
    idx = np.arange(verts.shape[0]).reshape(-1, 3)
    mesh = Mesh(vertices=verts, indices=idx)
    scene_p = compile_scene([mesh], intersector="pallas")
    scene_p = dataclasses.replace(scene_p, tri_tree=None)
    scene_b = compile_scene([mesh], intersector="brute")
    # storage count may exceed n_tri (SBVH duplication); the cluster table
    # is padded to a SUPER multiple (padded rows are index-guarded)
    from akari_tpu.ops.pallas_cluster import SUPER, SUPER_CHUNK

    k = (scene_p.n_tris + 127) // 128
    assert scene_p.tri_clusters.shape[0] == ((k + SUPER - 1) // SUPER) * SUPER
    s_real = (k + SUPER - 1) // SUPER
    s_pad = ((s_real + SUPER_CHUNK - 1) // SUPER_CHUNK) * SUPER_CHUNK
    assert scene_p.tri_superclusters.shape[0] == s_pad

    rr = np.random.default_rng(2)
    nr = 256
    o = jnp.asarray(rr.uniform(-5, 5, size=(nr, 3)).astype(np.float32))
    d = rr.normal(size=(nr, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    hp = intersect(scene_p, o, d)
    hb = intersect(scene_b, o, d)
    np.testing.assert_array_equal(np.asarray(hp.valid), np.asarray(hb.valid))
    np.testing.assert_array_equal(_orig_prim(scene_p, hp), _orig_prim(scene_b, hb))
    ok = np.asarray(hb.valid)
    np.testing.assert_allclose(
        np.asarray(hp.t)[ok], np.asarray(hb.t)[ok], rtol=1e-5, atol=1e-5
    )
    op = occlude(scene_p, o, d, 0.0, 1e30)
    ob = occlude(scene_b, o, d, 0.0, 1e30)
    np.testing.assert_array_equal(np.asarray(op), np.asarray(ob))
