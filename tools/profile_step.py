"""Attribute the driver-bench step time to pipeline stages (TPU).

Decomposes the flagship fwd+bwd step (bench.py primary: 256^2, 4 spp,
depth 5 Cornell) into separately jitted sub-programs and times each with
the same amortized harness bench.py uses. Output: a markdown table +
derived roofline notes, printed and appended to BENCH_NOTES.md-compatible
text (the TPU analog of the reference's per-kernel stats table,
ref: src/akari/kernel/cuda/launch.cpp:92-117).

Run ON TPU with nothing else using the chip:
    python tools/profile_step.py [--trace]

--trace additionally captures a jax.profiler trace of one step under
/tmp/akari_xprof (inspect with xprof/tensorboard where available).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _timeit(fn, fetch, iters=10, warmup=2):
    for _ in range(warmup):
        fetch(fn())
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn()
    fetch(last)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from akari_tpu.diff.inverse import apply_params, scene_params
    from akari_tpu.integrators.path import (
        PathConfig, camera_rays, render, trace_accumulate,
    )
    from akari_tpu.ops.gather import gather_rows
    from akari_tpu.ops.intersect import T_MAX, intersect
    from akari_tpu.parallel.mesh import make_ray_mesh
    from akari_tpu.parallel.render import loss_and_image_sharded
    from akari_tpu.scene.builtin import cornell_box

    width = height = 256
    spp, max_depth = 4, 5
    n = width * height * spp  # rays per wavefront (single chunk)
    cfg = PathConfig(spp=spp, max_depth=max_depth)

    sc = cornell_box(width, height)
    scene = jax.device_put(sc.compile(intersector="auto"))
    camera = sc.camera
    mesh = make_ray_mesh()
    target = jnp.zeros((height, width, 3), jnp.float32)
    params = scene_params(scene)

    def loss_fn(params):
        s = apply_params(scene, params)
        loss, _ = loss_and_image_sharded(s, camera, cfg, mesh, target, seed=0)
        return loss

    rows = []

    def add(name, fn, fetch, iters=None):
        dt = _timeit(fn, fetch, iters=iters or args.iters)
        rows.append((name, dt))
        print(f"{name:<46} {dt * 1e3:9.2f} ms", flush=True)
        return dt

    # ---- the full bench step (fwd+bwd) ----------------------------------
    step = jax.jit(jax.value_and_grad(loss_fn))
    add("step fwd+bwd (bench metric)", lambda: step(params)[0], float)

    # ---- forward-only variants ------------------------------------------
    loss_j = jax.jit(loss_fn)
    add("loss fwd only (sharded)", lambda: loss_j(params), float)
    render_j = jax.jit(lambda: render(scene, camera, cfg, seed=0))
    add("render fwd (no shard_map/loss)", render_j,
        lambda x: float(jnp.mean(x)))

    # ---- intersection-only: the 1 + 5 fused launches of the real step ---
    pix = jnp.arange(n, dtype=jnp.uint32)
    smp = jnp.zeros(n, jnp.uint32)

    def isect_chain():
        o, d = camera_rays(camera, 0, smp, pix, jnp)
        h = intersect(scene, o, d)
        acc = h.t
        for _ in range(max_depth):
            # fused shadow+extension launch shape: 2n rays
            o2 = jnp.concatenate([o, o], axis=0)
            d2 = jnp.concatenate([d, -d], axis=0)
            h2 = intersect(scene, o2, d2)
            acc = acc + h2.t[:n]
        return acc

    add("camera + 6 intersect launches (1x n + 5x 2n)",
        jax.jit(isect_chain), lambda x: float(jnp.sum(x)))

    add("camera_rays only",
        jax.jit(lambda: camera_rays(camera, 0, smp, pix, jnp)),
        lambda x: float(jnp.sum(x[0])))

    o, d = jax.jit(lambda: camera_rays(camera, 0, smp, pix, jnp))()
    one = jax.jit(lambda: intersect(scene, o, d).t)
    add("single intersect launch (n rays)", one, lambda x: float(jnp.sum(x)))
    o2 = jnp.concatenate([o, o], axis=0)
    d2 = jnp.concatenate([d, d], axis=0)
    two = jax.jit(lambda: intersect(scene, o2, d2).t)
    add("single intersect launch (2n rays)", two, lambda x: float(jnp.sum(x)))

    # ---- shading-path pieces --------------------------------------------
    if scene.prim_table is not None:
        ids = jnp.arange(n, dtype=jnp.int32) % scene.prim_table.shape[0]
        add("gather_rows prim_table [n]",
            jax.jit(lambda: gather_rows(scene.prim_table, ids)),
            lambda x: float(jnp.sum(x)), iters=20)

    # one full bounce minus intersection: run trace with max_depth=1 and
    # subtract the known intersect cost offline (table note).
    cfg1 = PathConfig(spp=spp, max_depth=1)
    add("render fwd depth-1 (camera+1 bounce+2 isect)",
        jax.jit(lambda: render(scene, camera, cfg1, seed=0)),
        lambda x: float(jnp.mean(x)))

    # fwd+bwd of depth-1 for backward attribution at small depth
    def loss1(params):
        s = apply_params(scene, params)
        img = trace_accumulate(
            s, camera, cfg1, 0, jnp.arange(width * height, dtype=jnp.uint32)
        )
        return jnp.mean((img - target.reshape(-1, 3)) ** 2)

    step1 = jax.jit(jax.value_and_grad(loss1))
    add("step fwd+bwd depth-1 (no shard_map)",
        lambda: step1(params), lambda x: float(x[0]))

    def loss_ns(params):
        s = apply_params(scene, params)
        img = trace_accumulate(
            s, camera, cfg, 0, jnp.arange(width * height, dtype=jnp.uint32)
        )
        return jnp.mean((img - target.reshape(-1, 3)) ** 2)

    step_ns = jax.jit(jax.value_and_grad(loss_ns))
    add("step fwd+bwd (no shard_map)",
        lambda: step_ns(params), lambda x: float(x[0]))

    if args.trace:
        with jax.profiler.trace("/tmp/akari_xprof"):
            float(step(params)[0])
        print("trace written to /tmp/akari_xprof", flush=True)

    total = rows[0][1]
    print("\n| stage | ms | % of step |")
    print("|---|---|---|")
    for name, dt in rows:
        print(f"| {name} | {dt * 1e3:.2f} | {100 * dt / total:.0f}% |")
    print(json.dumps({r[0]: round(r[1] * 1e3, 3) for r in rows}))


if __name__ == "__main__":
    main()
