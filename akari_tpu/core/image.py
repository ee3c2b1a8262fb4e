"""Image read/write (ref: src/akari/core/image.{hpp,cpp} — stb-based I/O,
gamma post-processing). Here: PIL for PNG/JPEG, numpy .npy for HDR float
images (the reference's .hdr reader analog), plus the post-process chain.
"""

from __future__ import annotations

import numpy as np

from .spectrum import linear_to_srgb, srgb_to_linear, to_uint8_srgb


def write_png(path, img_linear):
    """[H,W,3] linear float -> sRGB PNG."""
    from PIL import Image

    Image.fromarray(to_uint8_srgb(img_linear), mode="RGB").save(path)


def write_hdr_npy(path, img_linear):
    np.save(path, np.asarray(img_linear, dtype=np.float32))


def read_image(path, to_linear=True):
    """Read PNG/JPEG (sRGB -> linear float) or .npy (already linear).

    Returns [H, W, 3] float32. ref: image.cpp:86-128 ldr/hdr readers.
    """
    path = str(path)
    if path.endswith(".npy"):
        img = np.load(path).astype(np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        return img[..., :3]
    from PIL import Image

    raw = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    return srgb_to_linear(raw).astype(np.float32) if to_linear else raw


# Post-processing chain (ref: image.hpp PostProcessor / GammaCorrection /
# PostProcessingPipeline) — functional composition instead of virtual classes.

def gamma_correction(img, gamma=1.0 / 2.4):
    return linear_to_srgb(img)


def identity(img):
    return img


def pipeline(*stages):
    def run(img):
        for s in stages:
            img = s(img)
        return img

    return run
