"""Built-in test scenes.

The Cornell box asset (scenes/cornell_box/) is the public-domain data set by
Guedis Cardenas and Morgan McGuire (Williams College, 2011) — the same data
the reference renders as its de-facto integration test
(ref: resources/data/cornell_box/scene.akari: camera fov 15deg at (0,1,9),
materials red/green walls + white, light Ke = (17,12,4)).
"""

from __future__ import annotations

import os

import numpy as np

from ..core import transform as xform
from .arrays import make_camera
from .nodes import DiffuseMaterial, EmissiveMaterial, Mesh, Scene
from .obj import load_obj

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "scenes")


def cornell_box_mesh():
    path = os.path.join(_ASSET_DIR, "cornell_box", "CornellBox-Original.obj")
    if os.path.exists(path):
        return load_obj(path)
    return _cornell_box_fallback()


def cornell_box(width=256, height=256, fov_deg=15.0):
    """The canonical workload scene (ref: scene.akari:3-20)."""
    mesh = cornell_box_mesh()
    c2w = xform.translate((0.0, 1.0, 9.0))  # identity rotation, looks down -Z
    cam = make_camera(c2w, fov_deg, width, height)
    return Scene(shapes=[mesh], camera=cam)


def terrain_mesh(n=512, seed=0):
    """Procedural heightfield: (n-1)^2 quads -> 2*(n-1)^2 triangles.

    The large-scene workload (n=512 -> 522,242 tris) for exercising the
    hierarchical Pallas intersector past toy sizes — the role the
    reference's breakfast-room style OBJ scenes play for its SBVH
    (ref: kernel/bvh-accelerator.h builds per-mesh BVHs of arbitrary size).
    Deterministic: a fixed sum-of-sines displacement plus seeded jitter.
    """
    r = np.random.default_rng(seed)
    xs = np.linspace(-1.0, 1.0, n, dtype=np.float64)
    zs = np.linspace(-1.0, 1.0, n, dtype=np.float64)
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    Y = 0.22 * (
        np.sin(3.1 * np.pi * X) * np.cos(2.3 * np.pi * Z)
        + 0.55 * np.sin(7.9 * np.pi * X + 1.1) * np.sin(6.1 * np.pi * Z)
        + 0.3 * np.cos(13.0 * np.pi * (X + Z))
    ) + 0.35
    Y += 0.01 * r.standard_normal(Y.shape)
    verts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(np.float32)

    i = np.arange(n - 1)
    jj, ii = np.meshgrid(i, i, indexing="ij")
    a = (ii * n + jj).ravel()
    b = a + 1
    c = a + n
    d = c + 1
    idx = np.concatenate(
        [np.stack([a, c, b], axis=-1), np.stack([b, c, d], axis=-1)]
    ).astype(np.int64)

    white = DiffuseMaterial((0.73, 0.71, 0.68))
    return Mesh(vertices=verts, indices=idx, materials=[white],
                material_ids=np.zeros(idx.shape[0], np.int64))


def terrain_scene(width=256, height=256, n=512):
    """Terrain + overhead area light; camera looks down at the relief."""
    terrain = terrain_mesh(n)
    light = EmissiveMaterial((14.0, 13.0, 11.0))
    lq = _quad((-0.5, 2.4, 0.5), (-0.5, 2.4, -0.5),
               (0.5, 2.4, -0.5), (0.5, 2.4, 0.5))
    lverts = np.stack(lq).reshape(-1, 3)
    lmesh = Mesh(
        vertices=lverts,
        indices=np.arange(6, dtype=np.int64).reshape(-1, 3),
        materials=[light],
        material_ids=np.zeros(2, np.int64),
    )
    c2w = xform.look_at((1.6, 1.9, 2.3), (0.0, 0.25, 0.0))
    cam = make_camera(c2w, 40.0, width, height)
    return Scene(shapes=[terrain, lmesh], camera=cam)


def _quad(p0, p1, p2, p3):
    """Two CCW triangles for the quad p0 p1 p2 p3."""
    return [np.asarray([p0, p1, p2], np.float32), np.asarray([p0, p2, p3], np.float32)]


def _cornell_box_fallback():
    """Programmatic Cornell box with the classic dimensions (x,z in [-1,1],
    y in [0,2]; light quad just under the ceiling). Used if the bundled OBJ
    asset is missing."""
    white = DiffuseMaterial((0.725, 0.71, 0.68))
    red = DiffuseMaterial((0.63, 0.065, 0.05))
    green = DiffuseMaterial((0.14, 0.45, 0.091))
    light = EmissiveMaterial((17.0, 12.0, 4.0))

    tris = []
    mats = []

    def add(quads, m):
        for t in quads:
            tris.append(t)
            mats.append(m)

    add(_quad((-1, 0, 1), (1, 0, 1), (1, 0, -1), (-1, 0, -1)), white)    # floor
    add(_quad((-1, 2, 1), (-1, 2, -1), (1, 2, -1), (1, 2, 1)), white)    # ceiling
    add(_quad((-1, 0, -1), (1, 0, -1), (1, 2, -1), (-1, 2, -1)), white)  # back
    add(_quad((1, 0, -1), (1, 0, 1), (1, 2, 1), (1, 2, -1)), green)      # right
    add(_quad((-1, 0, 1), (-1, 0, -1), (-1, 2, -1), (-1, 2, 1)), red)    # left
    add(
        _quad(
            (-0.24, 1.98, 0.16), (-0.24, 1.98, -0.22),
            (0.23, 1.98, -0.22), (0.23, 1.98, 0.16),
        ),
        light,
    )

    p = np.stack(tris)  # [F,3,3]
    materials = [white, red, green, light]
    mat_ids = np.asarray([materials.index(m) for m in mats], np.int64)
    verts = p.reshape(-1, 3)
    idx = np.arange(verts.shape[0], dtype=np.int64).reshape(-1, 3)
    return Mesh(vertices=verts, indices=idx, materials=materials, material_ids=mat_ids)
