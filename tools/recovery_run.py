"""BASELINE config 4: Cornell albedo+emitter recovery, Adam, 1k iters.

Runs on the real TPU chip; writes gallery/recovery_r5.md (loss curve +
recovered-vs-true parameters + max parameter error) and
gallery/recovery_r5.png (target | corrupted | recovered strip).

r5 (VERDICT r4 weak #3): cosine lr decay, an spp ramp (4 -> 16 -> 32),
late-iterate EMA averaging, and the report now leads with PARAMETER
error, not just loss. (The r4 run also suffered the masked-microfacet
NaN-gradient bug — those gradients were zeroed, silently biasing Adam.)

  timeout 3600 python tools/recovery_run.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from akari_tpu.diff.inverse import InverseConfig, inverse_render
from akari_tpu.integrators.path import PathConfig, render
from akari_tpu.parallel.mesh import make_ray_mesh
from akari_tpu.parallel.render import loss_and_image_sharded
from akari_tpu.scene.builtin import cornell_box

RES = 128
ITERS = 1000


def main():
    sc = cornell_box(RES, RES)
    scene = jax.device_put(sc.compile(intersector="auto"))
    cfg = PathConfig(spp=4, max_depth=3, mis=True)
    mesh = make_ray_mesh()  # all local devices (1 chip here)

    target = jax.lax.stop_gradient(render(scene, sc.camera,
                                          dataclasses.replace(cfg, spp=16),
                                          seed=777))
    bad = dataclasses.replace(
        scene,
        textures=dataclasses.replace(
            scene.textures, value=scene.textures.value * 0.4
        ),
    )
    loss0, _ = loss_and_image_sharded(bad, sc.camera, cfg, mesh, target, seed=0)
    img_bad = np.asarray(render(bad, sc.camera, cfg, seed=5))

    icfg = InverseConfig(
        iterations=ITERS, learning_rate=0.05, seed=0,
        lr_schedule="cosine",
        spp_ramp=((0.5, 16), (0.85, 32)),
        param_ema=0.98,
        param_space="log",
    )
    recovered, losses, _ = inverse_render(
        bad, sc.camera, cfg, target, mesh, icfg,
    )
    loss_end, _ = loss_and_image_sharded(
        recovered, sc.camera, cfg, mesh, target, seed=0
    )
    img_rec = np.asarray(render(recovered, sc.camera, cfg, seed=5))

    true_v = np.asarray(scene.textures.value)
    rec_v = np.asarray(recovered.textures.value)
    # parameter error over textures that matter (true value >= 0.05;
    # dark/unused texels have no image influence and no gradient signal)
    sig = true_v >= 0.05
    rel_err = np.abs(rec_v - true_v) / np.maximum(true_v, 1e-6)
    max_rel = float(rel_err[sig].max()) if sig.any() else 0.0
    mean_rel = float(rel_err[sig].mean()) if sig.any() else 0.0

    from akari_tpu.core.image import write_png

    strip = np.concatenate([np.asarray(target), img_bad, img_rec], axis=1)
    write_png("gallery/recovery_r5.png", strip)

    with open("gallery/recovery_r5.md", "w") as f:
        f.write("# Cornell albedo+emitter recovery (BASELINE config 4)\n\n")
        f.write(f"- {RES}x{RES}, depth 3, MIS; Adam (log-space) lr 0.05 cosine-decayed, "
                f"{ITERS} iterations, spp ramp 4->16 (iter 500) ->32 "
                f"(iter 850), EMA(0.98) late-iterate averaging, LOG-space "
                "parameters; 1 TPU chip\n")
        f.write("- corruption: all texture values scaled by 0.4\n")
        f.write(f"- loss (matched seed): corrupted {float(loss0):.6f} -> "
                f"recovered {float(loss_end):.6f} "
                f"({float(loss_end)/float(loss0):.4f}x)\n")
        f.write(f"- **parameter error (significant texels)**: "
                f"max {100*max_rel:.2f}%  mean {100*mean_rel:.2f}%\n\n")
        f.write("## Loss curve (every 50 iters)\n\n```\n")
        for i in range(0, ITERS, 50):
            f.write(f"iter {i:4d}  loss {losses[i]:.6f}\n")
        f.write(f"iter {ITERS-1:4d}  loss {losses[-1]:.6f}\n```\n\n")
        f.write("## Recovered vs true texture values\n\n")
        f.write("| tex | true | corrupted | recovered |\n|---|---|---|---|\n")
        for i in range(true_v.shape[0]):
            t = np.round(true_v[i], 3).tolist()
            b = np.round(true_v[i] * 0.4, 3).tolist()
            r = np.round(rec_v[i], 3).tolist()
            f.write(f"| {i} | {t} | {b} | {r} |\n")
        f.write("\n![target / corrupted / recovered](recovery_r5.png)\n")
    print("wrote gallery/recovery_r5.md; loss", float(loss0), "->",
          float(loss_end), "max param err", max_rel)


if __name__ == "__main__":
    main()
