"""Benchmark: rays/sec/chip forward+backward at 4spp Cornell box.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The baseline denominator is the reference's only stated CPU throughput
figure, 0.5 M rays/s (ref: src/akari/kernel/integrators/cpu/
integrator.cpp:102 — a hard-coded progress-cadence estimate; the reference
publishes no measured numbers, see BASELINE.md).

Timing: the remote-TPU tunnel makes jax.block_until_ready unreliable, so
we amortize N in-order dispatches and force completion with one scalar
fetch (device executes in order; the ~25 ms fetch round-trip amortizes out).
"""

import json
import sys
import time


def main():
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

    def run_once(p):
        loss, grads = step(p)
        return loss

    # warmup/compile + full completion via scalar fetch
    float(run_once(params))

    iters = 10
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = run_once(params)
    float(last)  # fetch forces completion of the in-order queue
    dt = (time.perf_counter() - t0) / iters

    # rays per fwd+bwd step: camera + bounce extension rays + shadow rays
    # = spp * pixels * (max_depth+1 extension + max_depth shadow)
    rays = spp * width * height * (2 * max_depth + 1)
    n_chips = jax.device_count()
    rays_per_sec_per_chip = rays / dt / n_chips

    baseline = 0.5e6  # ref CPU estimate (integrators/cpu/integrator.cpp:102)
    print(
        json.dumps(
            {
                "metric": "rays_per_sec_per_chip_fwd_bwd_4spp_cornell",
                "value": round(rays_per_sec_per_chip, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_sec_per_chip / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
