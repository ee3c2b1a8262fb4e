"""Scene I/O tests: OBJ import, mesh cache round-trip, SDL parsing."""

import os

import numpy as np
import pytest

from akari_tpu.scene import meshcache, sdl
from akari_tpu.scene.builtin import _ASSET_DIR, cornell_box_mesh
from akari_tpu.scene.nodes import (
    DiffuseMaterial,
    EmissiveMaterial,
    Mesh,
    Scene,
)
from akari_tpu.scene.obj import load_obj

CORNELL_OBJ = os.path.join(_ASSET_DIR, "cornell_box", "CornellBox-Original.obj")


def test_load_cornell_obj():
    mesh = load_obj(CORNELL_OBJ)
    # 18 faces (quads + tris) triangulated -> 32 triangles, 8 materials
    assert len(mesh.indices) > 20
    assert len(mesh.materials) == 8
    kinds = [type(m).__name__ for m in mesh.materials]
    assert "EmissiveMaterial" in kinds  # the light (Ke 17 12 4)
    em = [m for m in mesh.materials if isinstance(m, EmissiveMaterial)][0]
    np.testing.assert_allclose(em.color, (17.0, 12.0, 4.0))
    # red wall present
    diff = [m for m in mesh.materials if isinstance(m, DiffuseMaterial)]
    assert any(abs(np.asarray(m.color)[0] - 0.63) < 1e-3 for m in diff)


def test_mesh_cache_roundtrip(tmp_path):
    mesh = load_obj(CORNELL_OBJ)
    p = str(tmp_path / "m.npz")
    meshcache.save_mesh(p, mesh)
    m2 = meshcache.load_mesh(p, mesh.materials)
    np.testing.assert_array_equal(m2.vertices, mesh.vertices)
    np.testing.assert_array_equal(m2.indices, mesh.indices)
    np.testing.assert_array_equal(m2.material_ids, mesh.material_ids)
    assert m2.materials == mesh.materials


def test_mesh_cache_bad_magic(tmp_path):
    p = str(tmp_path / "bad.npz")
    np.savez(p, __magic__=np.frombuffer(b"NOPE", dtype=np.uint8))
    with pytest.raises(ValueError):
        meshcache.load_mesh(p)


def test_sdl_parse_scene():
    path = os.path.join(_ASSET_DIR, "cornell_box", "scene.akari")
    module = sdl.parse_file(path)
    scene = module.exports["scene"]
    assert isinstance(scene, Scene)
    assert scene.camera.width == 512
    assert scene.integrator.spp == 16
    assert scene.integrator.max_depth == 5
    assert len(scene.shapes) == 1
    assert isinstance(scene.shapes[0], Mesh)


def test_sdl_values_and_refs():
    src = """
let x = [1, 2.5, true, "s"]
let m = DiffuseMaterial { color: [0.5, 0.5, 0.5] }
export y = $x
export mat = $m
"""
    module = sdl.parse_string(src)
    assert module.exports["y"] == [1, 2.5, True, "s"]
    assert isinstance(module.exports["mat"], DiffuseMaterial)


def test_sdl_import(tmp_path):
    (tmp_path / "lib.akari").write_text(
        'export red = DiffuseMaterial { color: [1,0,0] }\n'
    )
    (tmp_path / "main.akari").write_text(
        'import "lib.akari" as lib\nexport m = $lib.red\n'
    )
    module = sdl.parse_file(str(tmp_path / "main.akari"))
    assert isinstance(module.exports["m"], DiffuseMaterial)


def test_sdl_errors():
    with pytest.raises(sdl.SDLError):
        sdl.parse_string("export = 3")
    with pytest.raises(sdl.SDLError):
        sdl.parse_string("let a = Unknown { }")
    with pytest.raises(sdl.SDLError):
        sdl.parse_string("let a = $missing")


def test_importer_cli_roundtrip(tmp_path):
    from akari_tpu.cli.importer import main as import_main

    rc = import_main([CORNELL_OBJ, "-o", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "CornellBox_Original.mesh.npz").exists()
    akari = tmp_path / "CornellBox_Original.akari"
    assert akari.exists()
    module = sdl.parse_file(str(akari))
    mesh = module.exports["mesh"]
    assert isinstance(mesh, Mesh)
    assert len(mesh.materials) == 8
