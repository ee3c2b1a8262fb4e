"""Deterministic counter RNG tests: backend equality, range, uniformity."""

import numpy as np
import jax.numpy as jnp

from akari_tpu.core import rng


def test_jax_numpy_bitwise_equal():
    pix = np.arange(4096, dtype=np.uint32)
    for dim in (0, 5, 17):
        a = rng.random_u32(7, pix, 3, dim)
        b = rng.random_u32(
            jnp.uint32(7), jnp.asarray(pix), jnp.uint32(3), jnp.uint32(dim)
        )
        np.testing.assert_array_equal(a, np.asarray(b))


def test_uniform_range_and_mean():
    pix = np.arange(65536, dtype=np.uint32)
    u = rng.uniform(0, pix, 0, 0)
    assert u.dtype == np.float32
    assert np.all(u >= 0.0) and np.all(u < 1.0)
    assert abs(float(u.mean()) - 0.5) < 0.01
    # chi-square uniformity over 64 bins
    counts, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = len(pix) / 64
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    assert chi2 < 64 * 2.0, chi2  # very loose bound


def test_decorrelation_across_dims_samples():
    pix = np.arange(16384, dtype=np.uint32)
    u0 = rng.uniform(0, pix, 0, 0)
    u1 = rng.uniform(0, pix, 0, 1)
    u2 = rng.uniform(0, pix, 1, 0)
    assert abs(float(np.corrcoef(u0, u1)[0, 1])) < 0.02
    assert abs(float(np.corrcoef(u0, u2)[0, 1])) < 0.02


def test_seed_changes_stream():
    pix = np.arange(128, dtype=np.uint32)
    a = rng.uniform(0, pix, 0, 0)
    b = rng.uniform(1, pix, 0, 0)
    assert np.any(a != b)
