"""Benchmark: rays/sec/chip forward+backward at 4spp Cornell box.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The baseline denominator is the reference's only stated CPU throughput
figure, 0.5 M rays/s (ref: src/akari/kernel/integrators/cpu/
integrator.cpp:102 — a hard-coded progress-cadence estimate; the reference
publishes no measured numbers, see BASELINE.md).

``--full`` additionally runs the canonical reference workload (Cornell
1024², 16 spp, depth 5 — ref: resources/data/cornell_box/scene.akari:3-20),
522k/2.1M-triangle terrain scenes and a 2M-world-tri instanced scene on
the Pallas hierarchy, a per-stage kernel timing table (ref:
print_kernel_stats, kernel/cuda/launch.cpp:92-117), the bf16-vs-f32
spectrum variant A/B, and a fwd+bwd attribution + roofline section,
writing BENCH_NOTES.md.

Timing: the remote-TPU tunnel makes jax.block_until_ready unreliable, so
we amortize N in-order dispatches and force completion with one scalar
fetch (device executes in order; the ~25 ms fetch round-trip amortizes out).
"""

import json
import sys
import time


def _timeit(fn, fetch, iters, warmup=6):
    """Amortized wall time per call; ``fetch(result)`` forces completion.

    warmup=6: the axon tunnel runs the first ~5 executions of a fresh
    executable ~4x slow (measured r5) — earlier rounds' per-stage tables
    under warmup=1 are inflated by it."""
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
    # unroll=True is the megakernel-style variant (ref keeps the same
    # choice behind a flag, gpu/cuda/integrator.cpp:409-419): unrolling
    # the bounce loop lets XLA fuse across bounces and drops the scan's
    # carry DUS ops — measured r5: 14.9 -> 11.6 ms/step (+29%) at ~2.3x
    # the compile time. The scan+remat path stays the library default
    # (compile-time ergonomics at big resolutions/depths).
    cfg = PathConfig(spp=spp, max_depth=max_depth, unroll=True, remat=False)

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
    # scenes are jit ARGUMENTS (a closure would bake the arrays into the
    # program as constants — megabytes of MLIR per compile, and the 2M-tri
    # scene overflows the remote-compile tunnel's request limit)
    rfn = jax.jit(lambda s: render(s, sc.camera, cfg, seed=0))
    dt = _timeit(lambda: rfn(scene), fetch_img, iters=3)
    r = fwd_rays(1024, 1024, 16, 5)
    lines += [
        "## Canonical workload (ref: cornell_box/scene.akari — 1024x1024, "
        "16 spp, depth 5, forward)",
        "",
        f"- wall: {dt:.3f} s/frame  |  {16 * 1024 * 1024 / dt / 1e6:.2f} "
        f"Mpaths/s  |  {r / dt / 1e6:.1f} M rays/s",
        "",
    ]

    # ---- large terrain meshes (Pallas ordered tree walk) ----------------
    # The XLA while-loop traversal FAULTS the TPU worker on big scenes
    # (reproduced r3 @522k tris and r4 @522k AND @130k, with a bounded
    # trip count — a libtpu kernel fault, not a hang), so it is excluded
    # from TPU benchmarking entirely; its correctness is covered by the
    # CPU equivalence tests (tests/test_bvh.py, test_instancing.py) and
    # the default path never routes TPU scenes to it.
    cfg_t = PathConfig(spp=4, max_depth=5)
    rt = fwd_rays(256, 256, 4, 5)
    tsc = terrain_scene(256, 256, n=512)
    tscene = jax.device_put(tsc.compile(intersector="pallas"))
    tfn = jax.jit(lambda s: render(s, tsc.camera, cfg_t, seed=0))
    t_522 = _timeit(lambda: tfn(tscene), fetch_img, iters=3)
    lines += [
        "## Large mesh: terrain (256x256, 4 spp, depth 5, forward)",
        "",
        "| scene | backend | s/frame | M rays/s |",
        "|---|---|---|---|",
        f"| 522,242 tris | pallas (ordered BVH2 tree walk) | {t_522:.3f} | "
        f"{rt / t_522 / 1e6:.1f} |",
        "",
        "- the XLA while-loop backend is excluded on TPU: it faults the "
        "worker at >=130k tris (r3+r4, bounded trip count — libtpu kernel "
        "fault). CPU equivalence tests cover it; the default path never "
        "selects it on TPU.",
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
    terr_isect_f = jax.jit(lambda s: intersect(s, to, td).t)
    terr_isect = lambda: terr_isect_f(tscene_p)

    stages = [
        ("camera_rays 64k", cam_fn, lambda x: float(jnp.sum(x[0])), n),
        ("intersect closest 64k (dense pallas, 36 tris)", isect_fn,
         lambda x: float(jnp.sum(x)), n),
        ("occlude 64k (dense pallas)", occl_fn,
         lambda x: float(jnp.sum(x)), n),
        ("intersect closest 64k (tree pallas, 522k tris)", terr_isect,
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

    # ---- 2.1M-tri terrain on the DEFAULT path (r3 verdict item 3b) ------
    tsc_big = terrain_scene(256, 256, n=1024)
    big = jax.device_put(tsc_big.compile(intersector="auto"))
    big_fn = jax.jit(lambda s: render(s, tsc_big.camera, cfg_t, seed=0))
    big_dt = _timeit(lambda: big_fn(big), fetch_img, iters=3)
    lines += [
        "## 2.09M-triangle terrain, default (`auto`) path "
        "(256x256, 4 spp, depth 5, forward)",
        "",
        f"- intersector resolved: `{big.intersector}` "
        "(ordered BVH2 tree walk)",
        f"- wall: {big_dt:.3f} s/frame  |  {rt / big_dt / 1e6:.1f} M rays/s "
        "— no worker crash (the r3 >500k-tri failure mode)",
        "",
    ]

    # ---- instanced per-prototype Pallas BLAS (r3 verdict item 5) --------
    import akari_tpu.scene.nodes as nodes_mod
    from akari_tpu.scene.builtin import terrain_mesh
    from akari_tpu.scene.nodes import Instance

    proto = terrain_mesh(n=128)  # 32k-tri prototype
    rng_np = np.random.default_rng(3)
    insts = []
    for k in range(64):
        from akari_tpu.core import transform as xform

        t = xform.translate(
            (float(rng_np.uniform(-40, 40)), 0.0,
             float(rng_np.uniform(-40, 40)))
        )
        insts.append(Instance(proto, np.asarray(t, np.float32)))
    n_world = 64 * len(np.asarray(proto.indices))
    old_flat = nodes_mod.FLATTEN_MAX_TRIS
    nodes_mod.FLATTEN_MAX_TRIS = 1  # force the two-level path
    try:
        isc = nodes_mod.compile_scene(insts, intersector="pallas")
    finally:
        nodes_mod.FLATTEN_MAX_TRIS = old_flat
    icam = tsc_big.camera
    iscene = jax.device_put(isc)
    inst_fn = jax.jit(lambda s: render(s, icam, cfg_t, seed=0))
    inst_dt = _timeit(lambda: inst_fn(iscene), fetch_img, iters=3)
    lines += [
        "## Instanced per-prototype Pallas BLAS "
        f"(64 instances x {len(np.asarray(proto.indices))} tris = "
        f"{n_world / 1e6:.2f}M world tris; 256x256, 4 spp, depth 5)",
        "",
        f"- intersector: `{iscene.intersector}` two-level "
        "(run_instanced_tree kernel), storage "
        f"{iscene.tri_v0.shape[0]} shared prototype tris",
        f"- wall: {inst_dt:.3f} s/frame  |  {rt / inst_dt / 1e6:.1f} M rays/s",
        "",
    ]

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

    # ---- step attribution + roofline (r3 verdict item 1) ----------------
    from akari_tpu.diff.inverse import apply_params, scene_params
    from akari_tpu.parallel.mesh import make_ray_mesh
    from akari_tpu.parallel.render import loss_and_image_sharded

    mesh = make_ray_mesh()
    target = jnp.zeros((256, 256, 3), jnp.float32)
    params = scene_params(scene2)

    def loss_fn(p):
        s = apply_params(scene2, p)
        loss, _ = loss_and_image_sharded(
            s, sc2.camera, cfg32, mesh, target, seed=0
        )
        return loss

    step = jax.jit(jax.value_and_grad(loss_fn))
    t_step = _timeit(lambda: step(params)[0], float, iters=10)
    t_fwd = _timeit(f32_fn, fetch_img, iters=10)
    n_rays = 256 * 256 * 4
    isect_fn2 = jax.jit(lambda: intersect(scene2, o, d).t)
    t_isect = _timeit(isect_fn2, lambda x: float(jnp.sum(x)), iters=10)
    lines += [
        "## Fwd+bwd step attribution (flagship bench config; "
        "see tools/profile_step.py for the full per-stage tool)",
        "",
        "| piece | ms |",
        "|---|---|",
        f"| full step (fwd + bwd, 4spp 256^2) | {t_step * 1e3:.2f} |",
        f"| forward render alone | {t_fwd * 1e3:.2f} |",
        f"| backward (difference) | {(t_step - t_fwd) * 1e3:.2f} |",
        f"| one dense intersect launch ({n_rays // 1000}k rays) "
        f"| {t_isect * 1e3:.2f} |",
        "",
        "### Roofline argument (v5e, 1 chip)",
        "",
        "- Per fwd+bwd step the wavefront moves ~60 B of live SoA state "
        "per ray per bounce plus one 40x26 fat-gather matmul per bounce: "
        "about 0.15 GB of HBM traffic per step against 819 GB/s peak "
        "(~0.2 ms) and ~25 GFLOP of VPU Moeller-Trumbore against ~4 "
        "TFLOP/s f32 (~6 ms). r5 xprof attribution of the 14.9 ms "
        "scan-mode step: fwd scan 5.6 ms + bwd scan 6.2 ms + ~3.2 ms "
        "outside; inside a bounce the Pallas launch is 0.46 ms and the "
        "remaining ~0.65 ms is ~90 small XLA ops (gather matmuls, scan "
        "carry DUS, elementwise fusions at a ~25 us floor each). "
        "UNROLLING the bounce loop (the megakernel-mode analog) removes "
        "the carry DUS and lets XLA fuse across bounces: 14.9 -> 11.6 ms "
        "(+29%), now within ~1.9x of the ~6 ms intersection-compute "
        "bound. Closing the rest requires folding the gather+closure+NEE "
        "chain into the Pallas launch (a hand-written backward kernel) - "
        "identified, not attempted this round.",
        "- History: r2/r3 18.0 M rays/s -> SoA component layout 29.9 M "
        "-> remat(save-isect) 145.4 M -> small-scene tri tiles 185.7 M "
        "-> r5 unrolled megakernel-mode bench step 248 M. The r5 rounds "
        "also moved the LARGE-scene asymptote: ordered BVH2 walk + "
        "dead-ray culling + population-adaptive ray sort took 522k-tri "
        "frames 1.5 -> 3.2 M rays/s, 2.09M-tri frames 0.5 -> 1.3 M "
        "rays/s, and the instanced 2.06M-world-tri scene 4.4 -> 5.1 M "
        "rays/s.",
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
