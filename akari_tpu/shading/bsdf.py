"""BSDF closures, batched over rays in local Z-up shading frames.

Capability parity with ref: src/akari/kernel/material.h:57-191
(DiffuseBSDF Lambert + cosine sampling; MicrofacetReflection GGX;
``BSDF`` wrapper doing frame transforms and choice_pdf scaling).
The reference's ``BSDFClosure`` Variant dispatch becomes masked
evaluation of both closures + a per-lane select — there are only two
closure kinds and both are pure VPU math, so evaluating both costs less
than any divergent-control alternative on a vector machine (SURVEY.md §7).

``params`` is an SoA dict per-ray: kind [N] (CLOSURE_*), color [N,3],
alpha [N] (microfacet roughness^2), dist [N] (microfacet model id),
choice_pdf [N]. Backend-generic (jnp / np).
"""

from __future__ import annotations

import numpy as np

from .. import sampling
from ..core.vecmath import (
    _xp,
    abs_cos_theta,
    cos_theta,
    dot,
    normalize,
    onb,
    reflect,
    same_hemisphere,
    to_local,
    to_world,
)
from . import microfacet as mf

CLOSURE_NULL = -1
CLOSURE_DIFFUSE = 0
CLOSURE_MICROFACET = 1

INV_PI = 1.0 / np.pi


# --------------------------- local-frame closures --------------------------

def _diffuse_eval(color, wo, wi):
    xp = _xp(wo)
    f = color * INV_PI
    return xp.where(same_hemisphere(wo, wi)[..., None], f, 0.0)


def _diffuse_pdf(wo, wi):
    xp = _xp(wo)
    pdf = sampling.cosine_hemisphere_pdf(abs_cos_theta(wi))
    return xp.where(same_hemisphere(wo, wi), pdf, 0.0)


def _diffuse_sample(color, wo, u):
    xp = _xp(wo)
    wi = sampling.cosine_hemisphere(u)
    # flip into wo's hemisphere (ref: material.h:57-66)
    flip = cos_theta(wo) < 0.0
    wi = xp.where(flip[..., None], wi * xp.asarray([1.0, 1.0, -1.0], xp.float32), wi)
    pdf = sampling.cosine_hemisphere_pdf(abs_cos_theta(wi))
    return wi, color * INV_PI, pdf


def _micro_eval(color, dist, alpha, wo, wi):
    xp = _xp(wo)
    same = same_hemisphere(wo, wi)
    cos_o = abs_cos_theta(wo)
    cos_i = abs_cos_theta(wi)
    wh = wo + wi
    wh_len = xp.sqrt(xp.maximum(dot(wh, wh), 1e-20))
    wh = wh / wh_len[..., None]
    # canonical upper-hemisphere half vector
    wh = xp.where((cos_theta(wh) < 0.0)[..., None], -wh, wh)
    d_val = mf.d(dist, alpha, wh)
    g_val = mf.g(dist, alpha, wo, wi, wh)
    denom = 4.0 * cos_i * cos_o
    f = color * (d_val * g_val / xp.maximum(denom, 1e-9))[..., None]
    ok = same & (cos_i > 0) & (cos_o > 0) & (dot(wh, wh) > 0)
    return xp.where(ok[..., None], f, 0.0)


def _micro_pdf(dist, alpha, wo, wi):
    xp = _xp(wo)
    wh = normalize(wo + wi, eps=1e-20)
    wh = xp.where((cos_theta(wh) < 0.0)[..., None], -wh, wh)
    pdf = mf.pdf_wh(dist, alpha, wh) / xp.maximum(4.0 * xp.abs(dot(wo, wh)), 1e-9)
    return xp.where(same_hemisphere(wo, wi), pdf, 0.0)


def _micro_sample(color, dist, alpha, wo, u):
    xp = _xp(wo)
    # sample in wo's hemisphere: mirror wo up, sample, mirror back
    flip = cos_theta(wo) < 0.0
    z_flip = xp.asarray([1.0, 1.0, -1.0], xp.float32)
    wo_up = xp.where(flip[..., None], wo * z_flip, wo)
    wh = mf.sample_wh(dist, alpha, wo_up, u)
    wi_up = reflect(wo_up, wh)
    wi = xp.where(flip[..., None], wi_up * z_flip, wi_up)
    pdf = mf.pdf_wh(dist, alpha, wh) / xp.maximum(
        4.0 * xp.abs(dot(wo_up, wh)), 1e-9
    )
    f = _micro_eval(color, dist, alpha, wo, wi)
    ok = same_hemisphere(wo, wi)
    pdf = xp.where(ok, pdf, 0.0)
    return wi, f, pdf


# ------------------------------ dispatch ----------------------------------

def eval_local(params, wo, wi):
    xp = _xp(wo)
    fd = _diffuse_eval(params["color"], wo, wi)
    fm = _micro_eval(params["color"], params["dist"], params["alpha"], wo, wi)
    is_mf = (params["kind"] == CLOSURE_MICROFACET)[..., None]
    f = xp.where(is_mf, fm, fd)
    return xp.where((params["kind"] == CLOSURE_NULL)[..., None], 0.0, f)


def pdf_local(params, wo, wi):
    xp = _xp(wo)
    pd = _diffuse_pdf(wo, wi)
    pm = _micro_pdf(params["dist"], params["alpha"], wo, wi)
    pdf = xp.where(params["kind"] == CLOSURE_MICROFACET, pm, pd)
    pdf = xp.where(params["kind"] == CLOSURE_NULL, 0.0, pdf)
    return pdf * params["choice_pdf"]


def sample_local(params, wo, u):
    xp = _xp(wo)
    wi_d, f_d, p_d = _diffuse_sample(params["color"], wo, u)
    wi_m, f_m, p_m = _micro_sample(
        params["color"], params["dist"], params["alpha"], wo, u
    )
    is_mf = params["kind"] == CLOSURE_MICROFACET
    wi = xp.where(is_mf[..., None], wi_m, wi_d)
    f = xp.where(is_mf[..., None], f_m, f_d)
    pdf = xp.where(is_mf, p_m, p_d)
    null = params["kind"] == CLOSURE_NULL
    f = xp.where(null[..., None], 0.0, f)
    pdf = xp.where(null, 0.0, pdf) * params["choice_pdf"]
    return wi, f, pdf


# --------------------------- world-frame wrapper ---------------------------

def make_frame(ns):
    """Shading frame from shading normal (ref: BSDF ctor, material.h:157)."""
    t, b = onb(ns)
    return t, b, ns


def eval_world(params, frame, wo_w, wi_w):
    t, b, n = frame
    return eval_local(params, to_local(t, b, n, wo_w), to_local(t, b, n, wi_w))


def pdf_world(params, frame, wo_w, wi_w):
    t, b, n = frame
    return pdf_local(params, to_local(t, b, n, wo_w), to_local(t, b, n, wi_w))


def sample_world(params, frame, wo_w, u):
    t, b, n = frame
    wi_l, f, pdf = sample_local(params, to_local(t, b, n, wo_w), u)
    return to_world(t, b, n, wi_l), f, pdf
