"""Sampling warp tests: geometric validity + statistical moments."""

import numpy as np

from akari_tpu import sampling
from akari_tpu.core import rng


def _u2(n, seed=0):
    pix = np.arange(n, dtype=np.uint32)
    return rng.uniform2(seed, pix, 0, 0)


def test_concentric_disk_in_disk():
    p = sampling.concentric_disk(_u2(8192))
    r2 = (p ** 2).sum(-1)
    assert np.all(r2 <= 1.0 + 1e-6)
    # uniform on disk: E[r^2] = 1/2
    assert abs(float(r2.mean()) - 0.5) < 0.01


def test_cosine_hemisphere_moments():
    w = sampling.cosine_hemisphere(_u2(16384))
    assert np.all(w[..., 2] >= 0.0)
    np.testing.assert_allclose((w ** 2).sum(-1), 1.0, atol=1e-5)
    # cosine-weighted: E[cos] = 2/3
    assert abs(float(w[..., 2].mean()) - 2.0 / 3.0) < 0.01


def test_uniform_sphere_unit_and_mean():
    w = sampling.uniform_sphere(_u2(16384))
    np.testing.assert_allclose((w ** 2).sum(-1), 1.0, atol=1e-5)
    assert np.all(np.abs(w.mean(axis=0)) < 0.02)


def test_uniform_triangle_valid_barycentrics():
    b = sampling.uniform_triangle(_u2(8192))
    assert np.all(b >= 0.0)
    assert np.all(b.sum(-1) <= 1.0 + 1e-6)
    # uniform barycentric: E[b0] = 1/3
    assert abs(float(b[..., 0].mean()) - 1.0 / 3.0) < 0.01


def test_power_heuristic():
    assert sampling.power_heuristic(np.float32(0.0), np.float32(1.0)) == 0.0
    w = sampling.power_heuristic(np.float32(1.0), np.float32(1.0))
    assert abs(float(w) - 0.5) < 1e-6
    s = sampling.power_heuristic(np.float32(2.0), np.float32(1.0)) + \
        sampling.power_heuristic(np.float32(1.0), np.float32(2.0))
    assert abs(float(s) - 1.0) < 1e-6
