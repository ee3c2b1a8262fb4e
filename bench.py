"""Benchmark: rays/sec/chip forward+backward at 4spp Cornell box.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The baseline denominator is the reference's only stated CPU throughput
figure, 0.5 M rays/s (ref: src/akari/kernel/integrators/cpu/
integrator.cpp:102 — a hard-coded progress-cadence estimate; the reference
publishes no measured numbers, see BASELINE.md).

``--full`` additionally runs the canonical reference workload (Cornell
1024², 16 spp, depth 5 — ref: resources/data/cornell_box/scene.akari:3-20),
the 522k-triangle terrain scene on both intersector backends, a per-stage
kernel timing table (ref: print_kernel_stats, kernel/cuda/launch.cpp:92-117)
and the bf16-vs-f32 spectrum variant A/B, writing BENCH_NOTES.md.

Timing: the remote-TPU tunnel makes jax.block_until_ready unreliable, so
we amortize N in-order dispatches and force completion with one scalar
fetch (device executes in order; the ~25 ms fetch round-trip amortizes out).
"""

import json
import sys
import time


def _timeit(fn, fetch, iters, warmup=1):
    """Amortized wall time per call; ``fetch(result)`` forces completion."""
    for _ in range(max(warmup, 1)):
        fetch(fn())
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn()
    fetch(last)
    return (time.perf_counter() - t0) / iters


def primary():
    """The driver metric: fwd+bwd rays/s/chip, 4spp 256^2 Cornell."""
    import jax
    import jax.numpy as jnp

    from akari_tpu.diff.inverse import apply_params, scene_params
    from akari_tpu.integrators.path import PathConfig
    from akari_tpu.parallel.mesh import make_ray_mesh
    from akari_tpu.parallel.render import loss_and_image_sharded
    from akari_tpu.scene.builtin import cornell_box

    width = height = 256
    spp = 4
    max_depth = 5
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

    step = jax.jit(jax.value_and_grad(loss_fn))
    dt = _timeit(lambda: step(params)[0], float, iters=10)

    # rays per fwd+bwd step: camera + bounce extension rays + shadow rays
    rays = spp * width * height * (2 * max_depth + 1)
    n_chips = jax.device_count()
    rays_per_sec_per_chip = rays / dt / n_chips

    baseline = 0.5e6  # ref CPU estimate (integrators/cpu/integrator.cpp:102)
    return {
        "metric": "rays_per_sec_per_chip_fwd_bwd_4spp_cornell",
        "value": round(rays_per_sec_per_chip, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_sec_per_chip / baseline, 3),
    }


def full_suite():
    """Extended workloads -> list of markdown lines for BENCH_NOTES.md."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from akari_tpu.integrators.path import PathConfig, render
    from akari_tpu.ops.intersect import intersect, occlude
    from akari_tpu.scene.builtin import cornell_box, terrain_scene
    from akari_tpu.utils.config import RGB_BF16

    lines = ["# BENCH notes (extended workloads)", ""]

    def fetch_img(img):
        return float(jnp.mean(img))

    def fwd_rays(w, h, spp, depth):
        return spp * w * h * (2 * depth + 1)

    # ---- canonical reference workload: 1024^2, 16 spp, depth 5 ----------
    sc = cornell_box(1024, 1024)
    scene = jax.device_put(sc.compile(intersector="auto"))
    cfg = PathConfig(spp=16, max_depth=5)
    rfn = jax.jit(lambda: render(scene, sc.camera, cfg, seed=0))
    dt = _timeit(rfn, fetch_img, iters=3)
    r = fwd_rays(1024, 1024, 16, 5)
    lines += [
        "## Canonical workload (ref: cornell_box/scene.akari — 1024x1024, "
        "16 spp, depth 5, forward)",
        "",
        f"- wall: {dt:.3f} s/frame  |  {16 * 1024 * 1024 / dt / 1e6:.2f} "
        f"Mpaths/s  |  {r / dt / 1e6:.1f} M rays/s",
        "",
    ]

    # ---- 522k-tri terrain: hierarchical Pallas vs XLA threaded BVH ------
    tsc = terrain_scene(256, 256, n=512)
    cfg_t = PathConfig(spp=4, max_depth=5)
    row = {}
    for backend in ("pallas", "bvh"):
        tscene = jax.device_put(tsc.compile(intersector=backend))
        tfn = jax.jit(lambda s=tscene: render(s, tsc.camera, cfg_t, seed=0))
        tdt = _timeit(tfn, fetch_img, iters=3)
        row[backend] = tdt
    rt = fwd_rays(256, 256, 4, 5)
    lines += [
        "## Large mesh: terrain 522,242 tris (256x256, 4 spp, depth 5, "
        "forward)",
        "",
        "| backend | s/frame | M rays/s |",
        "|---|---|---|",
        f"| pallas (supercluster-skip) | {row['pallas']:.3f} | "
        f"{rt / row['pallas'] / 1e6:.1f} |",
        f"| bvh (XLA while-loop) | {row['bvh']:.3f} | "
        f"{rt / row['bvh'] / 1e6:.1f} |",
        "",
        f"- pallas/bvh speedup: {row['bvh'] / row['pallas']:.2f}x",
        "",
    ]

    # ---- per-stage kernel table (Cornell 256^2 config) ------------------
    sc2 = cornell_box(256, 256)
    scene2 = jax.device_put(sc2.compile(intersector="auto"))
    n = 256 * 256
    pix = jnp.arange(n, dtype=jnp.uint32)
    from akari_tpu.integrators.path import camera_rays

    cam_fn = jax.jit(
        lambda: camera_rays(sc2.camera, 0, jnp.zeros(n, jnp.uint32), pix, jnp)
    )
    o, d = cam_fn()
    isect_fn = jax.jit(lambda: intersect(scene2, o, d).t)
    occl_fn = jax.jit(
        lambda: occlude(scene2, o, d, 0.0, jnp.full((n,), 1e3, jnp.float32))
    )
    fwd_fn = jax.jit(
        lambda: render(scene2, sc2.camera, PathConfig(spp=4, max_depth=5), seed=0)
    )
    tscene_p = jax.device_put(tsc.compile(intersector="pallas"))
    to, td = jax.jit(
        lambda: camera_rays(tsc.camera, 0, jnp.zeros(n, jnp.uint32), pix, jnp)
    )()
    terr_isect = jax.jit(lambda: intersect(tscene_p, to, td).t)

    stages = [
        ("camera_rays 64k", cam_fn, lambda x: float(jnp.sum(x[0])), n),
        ("intersect closest 64k (dense pallas, 36 tris)", isect_fn,
         lambda x: float(jnp.sum(x)), n),
        ("occlude 64k (dense pallas)", occl_fn,
         lambda x: float(jnp.sum(x)), n),
        ("intersect closest 64k (supercluster pallas, 522k tris)", terr_isect,
         lambda x: float(jnp.sum(x)), n),
        ("full forward render 256^2x4spp", fwd_fn, fetch_img,
         fwd_rays(256, 256, 4, 5)),
    ]
    lines += [
        "## Per-stage timing (ref: print_kernel_stats analog)",
        "",
        "| stage | ms | Mitem/s |",
        "|---|---|---|",
    ]
    for name, fn, fetch, items in stages:
        sdt = _timeit(fn, fetch, iters=5)
        lines.append(f"| {name} | {sdt * 1e3:.2f} | {items / sdt / 1e6:.1f} |")
    lines.append("")

    # ---- spectrum dtype variant A/B (bf16 vs f32) -----------------------
    cfg32 = PathConfig(spp=4, max_depth=5)
    cfg16 = dataclasses.replace(cfg32, dtypes=RGB_BF16)
    f32_fn = jax.jit(lambda: render(scene2, sc2.camera, cfg32, seed=0))
    bf16_fn = jax.jit(lambda: render(scene2, sc2.camera, cfg16, seed=0))
    img32 = np.asarray(f32_fn())
    img16 = np.asarray(bf16_fn())
    t32 = _timeit(f32_fn, fetch_img, iters=5)
    t16 = _timeit(bf16_fn, fetch_img, iters=5)
    err = float(np.abs(img16 - img32).mean() / max(img32.mean(), 1e-9))
    lines += [
        "## Spectrum dtype variant (ref: akari.conf Config<Float,Spectrum>)",
        "",
        "| variant | s/frame (256^2 x 4spp) | mean rel. image delta |",
        "|---|---|---|",
        f"| rgb-float32 | {t32:.3f} | — |",
        f"| rgb-bfloat16 | {t16:.3f} | {err:.4f} |",
        "",
    ]
    return lines


def main():
    full = "--full" in sys.argv
    result = primary()
    if full:
        import datetime

        lines = full_suite()
        lines += [
            "## Primary driver metric",
            "",
            f"- {result['metric']}: {result['value']:.0f} {result['unit']} "
            f"({result['vs_baseline']}x the reference's 0.5M rays/s CPU figure)",
            "",
            f"_Generated by `python bench.py --full` on "
            f"{datetime.date.today().isoformat()} (1 TPU chip)._",
        ]
        with open("BENCH_NOTES.md", "w") as f:
            f.write("\n".join(lines) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
