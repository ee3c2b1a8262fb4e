"""Real multi-process jax.distributed exercise (VERDICT r3 missing #5).

Two OS processes, each with 4 virtual CPU devices, connect through
``akari_tpu.parallel.mesh.initialize_distributed`` (the previously
never-exercised passthrough) into one 8-device global mesh; both render
the Cornell box ray-sharded across ALL 8 devices (collectives cross the
process boundary) and assert the replicated image mean equals the
single-process render. This is the closest this single-host environment
gets to the >=85%-at-2-hosts north star (SURVEY.md §5.8): it validates
process-spanning mesh construction, sharding, and the psum/all-gather
path end to end.

Run:  python tools/distributed_check.py            (parent; spawns workers)
      writes DISTRIBUTED_r04-style JSON to stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

COORD = "127.0.0.1:29784"
W, H, SPP, DEPTH = 64, 64, 2, 3


def _render_mean():
    """Sharded render over the full (possibly multi-process) mesh ->
    replicated scalar mean."""
    import jax
    import jax.numpy as jnp

    from akari_tpu.integrators.path import PathConfig
    from akari_tpu.parallel.mesh import make_ray_mesh
    from akari_tpu.parallel.render import render_sharded
    from akari_tpu.scene.builtin import cornell_box

    sc = cornell_box(W, H)
    scene = sc.compile(intersector="bvh")
    cfg = PathConfig(spp=SPP, max_depth=DEPTH)
    mesh = make_ray_mesh()

    fn = jax.jit(
        lambda: jnp.mean(render_sharded(scene, sc.camera, cfg, mesh, seed=0))
    )
    return float(fn()), jax.device_count(), jax.local_device_count()


def worker(process_id, expect_mean):
    from akari_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator=COORD, num_processes=2, process_id=process_id
    )
    mean, n_dev, n_local = _render_mean()
    assert n_dev == 8 and n_local == 4, (n_dev, n_local)
    rel = abs(mean - expect_mean) / max(abs(expect_mean), 1e-12)
    print(
        json.dumps(
            {
                "process_id": process_id,
                "devices": n_dev,
                "local_devices": n_local,
                "mean": mean,
                "expect": expect_mean,
                "rel_err": rel,
            }
        ),
        flush=True,
    )
    assert rel < 1e-5, (mean, expect_mean)


def main():
    # single-process golden (8 local devices)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, __file__, "--golden"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    if out.returncode != 0:
        print(out.stdout + out.stderr)
        raise SystemExit("golden run failed")
    golden = float(out.stdout.strip().splitlines()[-1])

    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(pid), str(golden)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    results, ok = [], True
    for p in procs:
        so, se = p.communicate(timeout=900)
        if p.returncode != 0:
            ok = False
            print(se[-4000:], file=sys.stderr)
        else:
            results.append(json.loads(so.strip().splitlines()[-1]))
    print(json.dumps({"ok": ok, "golden_mean": golden, "workers": results}))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    if "--golden" in sys.argv:
        mean, n_dev, _ = _render_mean()
        assert n_dev == 8, n_dev
        print(mean)
    elif "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), float(sys.argv[i + 2]))
    else:
        main()
