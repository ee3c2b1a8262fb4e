"""Shared image-comparison helper for golden tests.

Per-lane arithmetic matches across backends to f32 tolerance, but binary
visibility decisions (ray grazing a triangle edge) amplify ~1-ulp
FMA/fusion differences between compiled programs into O(1) radiance
differences on a handful of lanes. Estimator logic is decision-parity
tested separately (tests/test_render.py::test_decision_parity_with_oracle);
image comparisons budget a small outlier fraction while bounding the mean
error tightly (which catches any systematic bias).
"""

import numpy as np


def assert_images_match(a, b, rtol=1e-3, atol=2e-3, outlier_frac=0.0,
                        mean_tol=1e-3):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape
    d = np.abs(a - b)
    bad = d > (atol + rtol * np.abs(b))
    frac = float(bad.mean())
    assert frac <= outlier_frac, (
        f"{bad.sum()} / {bad.size} elements outside tolerance "
        f"(frac {frac:.4f} > budget {outlier_frac}); max diff {d.max():.4g}"
    )
    assert float(d.mean()) <= mean_tol, f"mean abs diff {d.mean():.3e}"
