"""Checkpoint / resume for long renders and inverse-rendering runs.

New capability vs the reference (SURVEY.md §5.4: the reference persists
nothing but mesh caches). State saved: film accumulator, next sample index,
RNG seed, and (for inverse loops) optimizer state + parameters. Uses orbax
when available, with a plain-npz fallback so checkpoints never depend on
optional infrastructure.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_render_state(path, radiance_sum, next_sample, seed, meta=None):
    """Atomic save of a progressive render accumulator."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp,
        radiance_sum=np.asarray(radiance_sum, np.float32),
        next_sample=np.int64(next_sample),
        seed=np.int64(seed),
        meta=np.frombuffer(json.dumps(meta or {}).encode(), dtype=np.uint8),
    )
    os.replace(tmp, path)


def load_render_state(path):
    """Returns (radiance_sum, next_sample, seed, meta) or None."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode() or "{}")
        return (
            z["radiance_sum"],
            int(z["next_sample"]),
            int(z["seed"]),
            meta,
        )


def save_train_state(path, params, opt_state, step, seed):
    """Checkpoint an inverse-rendering loop (orbax if present, npz fallback)."""
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(
            os.path.abspath(path),
            {"params": params, "opt_state": opt_state,
             "step": step, "seed": seed},
            force=True,
        )
        ckpt.wait_until_finished()
        return
    except Exception:
        pass
    import pickle

    import jax

    tmp = path + ".tmp.pkl"
    host = jax.tree_util.tree_map(lambda x: np.asarray(x), (params, opt_state))
    with open(tmp, "wb") as f:
        pickle.dump({"params": host[0], "opt_state": host[1],
                     "step": step, "seed": seed}, f)
    os.replace(tmp, path)


def load_train_state(path):
    if os.path.isdir(path):
        try:
            import orbax.checkpoint as ocp

            ckpt = ocp.StandardCheckpointer()
            return ckpt.restore(os.path.abspath(path))
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)
