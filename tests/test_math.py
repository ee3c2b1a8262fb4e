"""Core math tests (mirrors ref tests/test-math.cpp: srgb range, frame
round-trip — extended with transforms)."""

import numpy as np
import jax.numpy as jnp

from akari_tpu.core import spectrum, transform as xf, vecmath as vm


def test_srgb_range_and_roundtrip():
    x = np.linspace(0.0, 1.0, 256).astype(np.float32)
    s = spectrum.linear_to_srgb(x)
    assert np.all(s >= 0.0) and np.all(s <= 1.0)
    back = spectrum.srgb_to_linear(s)
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_onb_roundtrip():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(128, 3)).astype(np.float32)
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    t, b = vm.onb(n)
    # orthonormality
    np.testing.assert_allclose(vm.dot(t, b), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.dot(t, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.length(t), 1.0, atol=1e-5)
    # local<->world round trip (ref test-math.cpp Frame test)
    w = rng.normal(size=(128, 3)).astype(np.float32)
    local = vm.to_local(t, b, n, w)
    back = vm.to_world(t, b, n, local)
    np.testing.assert_allclose(back, w, atol=1e-4)


def test_transform_compose_apply():
    m = xf.translate((1, 2, 3)) @ xf.rotate_y(0.3) @ xf.scale(2.0)
    p = np.asarray([[1.0, 0.0, 0.0]], np.float32)
    q = xf.apply_point(m, p)
    # inverse brings it back
    back = xf.apply_point(xf.inverse(m), q)
    np.testing.assert_allclose(back, p, atol=1e-5)
    # vectors ignore translation
    v = xf.apply_vector(xf.translate((5, 5, 5)), p)
    np.testing.assert_allclose(v, p, atol=1e-6)


def test_normal_transform_preserves_orthogonality():
    m = xf.scale((2.0, 1.0, 0.5))
    # tangent on a surface with normal n
    n = np.asarray([[0.0, 1.0, 0.0]], np.float32)
    t = np.asarray([[1.0, 0.0, 0.0]], np.float32)
    nt = xf.apply_normal(m, n)
    tt = xf.apply_vector(m, t)
    np.testing.assert_allclose(vm.dot(nt, tt), 0.0, atol=1e-6)


def test_vecmath_jax_numpy_agree():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(64, 3)).astype(np.float32)
    b = rng.normal(size=(64, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(vm.cross(jnp.asarray(a), jnp.asarray(b))), vm.cross(a, b),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(vm.normalize(jnp.asarray(a))), vm.normalize(a), rtol=1e-5
    )
