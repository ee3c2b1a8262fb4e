"""1D sampling distributions as CDF arrays (ref: src/akari/common/distribution.h:47).

The reference's ``Distribution1D`` holds func/cdf buffers with binary-search
sampling. Here: build the CDF on the host at scene-compile time (NumPy) and
sample on device with ``searchsorted`` — a pure gather-friendly op that
XLA vectorizes over the whole ray batch at once.
"""

from __future__ import annotations

import numpy as np

from .vecmath import _xp


def build_cdf(weights):
    """Host-side. Returns (pdf, cdf) with cdf shape [n+1], cdf[-1] == 1.

    Degenerate all-zero weights become uniform (matching the reference's
    funcInt==0 branch, distribution.h:60-68).
    """
    w = np.asarray(weights, dtype=np.float64)
    n = w.shape[0]
    total = w.sum()
    if total <= 0.0:
        pdf = np.full(n, 1.0 / n)
    else:
        pdf = w / total
    cdf = np.concatenate([[0.0], np.cumsum(pdf)])
    cdf[-1] = 1.0
    return pdf.astype(np.float32), cdf.astype(np.float32)


def sample_discrete(cdf, u):
    """Device-side. u in [0,1) -> (index, pdf). cdf is the [n+1] array."""
    xp = _xp(u)
    cdf = xp.asarray(cdf)
    idx = xp.clip(xp.searchsorted(cdf, u, side="right") - 1, 0, cdf.shape[0] - 2)
    pdf = xp.take(cdf, idx + 1) - xp.take(cdf, idx)
    return idx.astype(xp.int32), pdf


def pdf_discrete(cdf, idx):
    xp = _xp(idx)
    cdf = xp.asarray(cdf)
    return xp.take(cdf, idx + 1) - xp.take(cdf, idx)


def sample_continuous(cdf, u):
    """Device-side piecewise-constant continuous sampling over [0, 1).

    u in [0,1) -> (x, pdf, index): x in [0,1) linearly interpolated inside
    the selected bin, pdf the continuous density (pmf * n), index the bin
    (ref: distribution.h:47-83 sample_continuous; searchsorted replaces
    the reference's upper_bound binary search).
    """
    xp = _xp(u)
    cdf = xp.asarray(cdf)
    n = cdf.shape[0] - 1
    idx = xp.clip(xp.searchsorted(cdf, u, side="right") - 1, 0, n - 1)
    c0 = xp.take(cdf, idx)
    pmf = xp.take(cdf, idx + 1) - c0
    du = xp.where(pmf > 0.0, (u - c0) / xp.where(pmf > 0.0, pmf, 1.0), 0.0)
    x = (idx.astype(cdf.dtype) + du) / n
    return x, pmf * n, idx.astype(xp.int32)


def pdf_continuous(cdf, x):
    """Continuous density at x in [0,1): pmf[floor(x*n)] * n
    (ref: distribution.h:120-134)."""
    xp = _xp(x)
    cdf = xp.asarray(cdf)
    n = cdf.shape[0] - 1
    idx = xp.clip((x * n).astype(xp.int32), 0, n - 1)
    return (xp.take(cdf, idx + 1) - xp.take(cdf, idx)) * n
