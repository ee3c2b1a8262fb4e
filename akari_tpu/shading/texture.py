"""Texture evaluation: constant and image textures, batched over rays.

Capability parity with ref: src/akari/kernel/texture.h:30-66
(ConstantTexture / ImageTexture variant with wrap-repeat, flipped V).
Improvement over the reference: bilinear filtering (the reference is
nearest-neighbor). Variant dispatch becomes a ``where`` select — both
branches are cheap gathers. Backend-generic (jnp / np) for the oracle.
"""

from __future__ import annotations

import numpy as np

from ..core.vecmath import _xp


def _bilinear(images, image_sizes, img_id, uv):
    """Sample stacked padded images [I,Hm,Wm,3] at uv with wrap repeat.

    V flipped (image row 0 = v=1), matching the reference's convention
    (texture.h ImageTexture::evaluate).
    """
    xp = _xp(uv)
    images = xp.asarray(images)
    h = xp.take(image_sizes[:, 0], img_id).astype(xp.float32)
    w = xp.take(image_sizes[:, 1], img_id).astype(xp.float32)
    u = uv[..., 0] % 1.0
    v = (-uv[..., 1]) % 1.0
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = xp.floor(x)
    y0 = xp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    hi = xp.take(image_sizes[:, 0], img_id)
    wi = xp.take(image_sizes[:, 1], img_id)

    def fetch(xi, yi):
        xi = xp.mod(xi.astype(xp.int32), wi)
        yi = xp.mod(yi.astype(xp.int32), hi)
        flat = images.reshape(-1, 3)
        stride_img = images.shape[1] * images.shape[2]
        idx = img_id * stride_img + yi * images.shape[2] + xi
        return xp.take(flat, idx, axis=0)

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def evaluate(textures, tex_id, uv):
    """(TextureTable, [N] ids, [N,2] uv) -> [N,3] rgb."""
    from ..scene.arrays import TEX_IMAGE

    xp = _xp(uv)
    kind = xp.take(textures.kind, tex_id)
    base = xp.take(textures.value, tex_id, axis=0)
    img_id = xp.take(textures.image_id, tex_id)
    img_rgb = _bilinear(textures.images, textures.image_sizes, img_id, uv)
    return xp.where((kind == TEX_IMAGE)[..., None], base * img_rgb, base)


def evaluate_scalar(textures, tex_id, uv):
    """First channel only (roughness / mix fraction; ref evaluates .x)."""
    return evaluate(textures, tex_id, uv)[..., 0]
