"""Stackless BVH traversal in plain XLA (the general-path intersector).

Redesign of the reference's stack-based traversal
(ref: src/akari/kernel/bvh-accelerator.h:488-547: 64-deep local stack,
near/far child ordering by ray sign). On a vector machine a per-lane stack
thrashes; the threaded layout (bvh/build.py) reduces per-ray state to one
node pointer and the whole batch steps in lockstep inside one
``lax.while_loop``:

    node = where(aabb_hit & inner, node + 1,      # descend (DFS next)
                 miss_link[node])                  # skip subtree / pop

Leaf primitive tests are a fixed MAX_LEAF-way unrolled masked gather, so
there is no data-dependent inner loop. All memory access is gathers, which
XLA vectorizes over the ray batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.intersect import Hit, T_MAX, moller_trumbore
from .build import MAX_LEAF


def _gather3(arr, idx):
    return jnp.take(arr, idx, axis=0)


def intersect_bvh(scene, o, d, t_min, t_max, any_hit=False):
    """Batched closest-hit (or any-hit) traversal. o, d: [N,3]."""
    bvh = scene.bvh
    n = o.shape[0]

    safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    inv_d = 1.0 / safe_d

    def cond(state):
        node, *_ = state
        return jnp.any(node >= 0)

    def body(state):
        node, best_t, best_prim, best_u, best_v = state
        active = node >= 0
        ni = jnp.maximum(node, 0)
        lo = _gather3(bvh.node_lo, ni)
        hi = _gather3(bvh.node_hi, ni)
        first = jnp.take(bvh.first, ni)
        count = jnp.take(bvh.count, ni)
        miss = jnp.take(bvh.miss, ni)

        # slab test against current best_t (shrinking t_max prunes)
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), t_min)
        far = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), best_t)
        hit_box = (near <= far) & active

        is_leaf = count > 0
        at_leaf = hit_box & is_leaf

        # Unrolled leaf primitive tests (reordered tris are leaf-contiguous).
        for k in range(MAX_LEAF):
            pid = first + k
            lane = at_leaf & (k < count)
            pid_s = jnp.where(lane, pid, 0)
            v0 = _gather3(scene.tri_v0, pid_s)
            e1 = _gather3(scene.tri_e1, pid_s)
            e2 = _gather3(scene.tri_e2, pid_s)
            h, t, u, v = moller_trumbore(o, d, v0, e1, e2, t_min, best_t)
            h = h & lane
            best_prim = jnp.where(h, pid, best_prim)
            best_u = jnp.where(h, u, best_u)
            best_v = jnp.where(h, v, best_v)
            best_t = jnp.where(h, t, best_t)

        descend = hit_box & ~is_leaf
        next_node = jnp.where(descend, node + 1, miss)
        next_node = jnp.where(active, next_node, -1)
        if any_hit:
            next_node = jnp.where(best_prim >= 0, -1, next_node)
        return (next_node, best_t, best_prim, best_u, best_v)

    init = (
        jnp.zeros((n,), jnp.int32),
        jnp.minimum(jnp.broadcast_to(t_max, (n,)), T_MAX),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )
    node, best_t, best_prim, best_u, best_v = jax.lax.while_loop(cond, body, init)
    valid = best_prim >= 0
    if any_hit:
        return valid
    return Hit(best_t, best_prim, jnp.stack([best_u, best_v], -1), valid)
