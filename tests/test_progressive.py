"""Progressive rendering + checkpoint/resume tests."""

import numpy as np
import pytest

from akari_tpu.integrators.path import PathConfig
from akari_tpu.integrators.progressive import render_progressive
from akari_tpu.scene.builtin import cornell_box
from akari_tpu.utils.checkpoint import load_render_state, save_render_state


@pytest.mark.slow
def test_progressive_matches_full(tmp_path):
    sc = cornell_box(8, 8)
    scene = sc.compile(intersector="bvh")
    cfg = PathConfig(spp=4, max_depth=1)
    img_chunked = render_progressive(
        scene, sc.camera, cfg, seed=7, spp_chunk=2, progress=False
    )
    img_once = render_progressive(
        scene, sc.camera, cfg, seed=7, spp_chunk=4, progress=False
    )
    np.testing.assert_allclose(img_chunked, img_once, rtol=1e-5, atol=1e-6)
    assert float(np.mean(img_once)) > 0.01


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    sc = cornell_box(8, 8)
    scene = sc.compile(intersector="bvh")
    cfg = PathConfig(spp=4, max_depth=1)
    ck = str(tmp_path / "render.ckpt.npz")

    full = render_progressive(
        scene, sc.camera, cfg, seed=3, spp_chunk=2, progress=False
    )

    # simulate an interrupted run: 2 of 4 samples, checkpointed
    import dataclasses

    half_cfg = dataclasses.replace(cfg, spp=2)
    render_progressive(
        scene, sc.camera, half_cfg, seed=3, spp_chunk=1,
        checkpoint_path=ck, checkpoint_every=1, progress=False,
    )
    state = load_render_state(ck)
    assert state is not None and state[1] == 2

    # resume requires matching meta; spoof it to the full config
    save_render_state(
        ck, state[0], state[1], 3,
        {"w": 8, "h": 8, "spp": 4, "max_depth": 1},
    )
    resumed = render_progressive(
        scene, sc.camera, cfg, seed=3, spp_chunk=1,
        checkpoint_path=ck, progress=False,
    )
    np.testing.assert_allclose(resumed, full, rtol=1e-5, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "s.npz")
    acc = np.random.default_rng(0).random((4, 4, 3)).astype(np.float32)
    save_render_state(p, acc, 5, 9, {"k": 1})
    r, n, s, meta = load_render_state(p)
    np.testing.assert_array_equal(r, acc)
    assert (n, s, meta) == (5, 9, {"k": 1})
    assert load_render_state(str(tmp_path / "missing.npz")) is None
