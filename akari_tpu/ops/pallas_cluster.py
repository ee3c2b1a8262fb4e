"""Cluster-skip Pallas intersector: two-level ray-stream tracing.

Scales the dense ray-stream idea (pallas_intersect.py) to large scenes:
triangles are grouped into fixed-size clusters of TRI_TILE consecutive
BVH-ordered triangles (spatially coherent by construction), each with a
precomputed AABB. Per 512-ray tile the kernel walks the cluster list:

  1. test the whole ray tile against the cluster AABB (branchless slab
     test on the VPU) and against the tile's current worst best-t;
  2. only if ANY ray hits, DMA the cluster's 128-triangle SoA block from
     HBM into VMEM and run the dense pairwise Moeller-Trumbore update.

Divergence exists only at (ray-tile x cluster) granularity — the classic
"ray stream" formulation (cf. quantized ray-stream tracing literature) —
so the VPU always runs full-width dense ops, and HBM traffic is limited
to clusters that actually intersect the tile's frustum-ish bound.
Replaces per-lane BVH walks, which Mosaic cannot gather efficiently.

Layouts match pallas_intersect.py: rays [N, 8]; tris [16, Tpad];
clusters [K, 8] (lo.xyz, hi.xyz, pad, pad); out [N, 4] = t, u, v, prim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import T_MAX
from .pallas_intersect import RAY_TILE, TRI_TILE, _pairwise_mt

_BIG = np.float32(T_MAX)


def build_clusters(tri_v0, tri_e1, tri_e2):
    """Host-side: [K, 8] cluster AABBs over TRI_TILE-sized triangle runs."""
    v0 = np.asarray(tri_v0, np.float64)
    p1 = v0 + np.asarray(tri_e1, np.float64)
    p2 = v0 + np.asarray(tri_e2, np.float64)
    t = v0.shape[0]
    k = (t + TRI_TILE - 1) // TRI_TILE
    pad = k * TRI_TILE - t

    def padded(a, fill):
        return np.concatenate([a, np.full((pad, 3), fill)]) if pad else a

    tri_lo = np.minimum(np.minimum(v0, p1), p2)
    tri_hi = np.maximum(np.maximum(v0, p1), p2)
    lo = padded(tri_lo, np.inf).reshape(k, TRI_TILE, 3).min(axis=1)
    hi = padded(tri_hi, -np.inf).reshape(k, TRI_TILE, 3).max(axis=1)
    eps = 1e-5 * np.maximum(1.0, np.abs(lo) + np.abs(hi))
    out = np.zeros((k, 8), np.float32)
    out[:, :3] = lo - eps
    out[:, 3:6] = hi + eps
    return out


def _cluster_kernel(rays_ref, clusters_ref, tris_hbm, out_ref,
                    tri_vmem, sem, *, n_clusters, any_hit):
    """Grid: (n_ray_tiles,). tris_hbm stays in HBM; clusters + rays in VMEM."""
    rays = rays_ref[:]  # [R, 8]
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    tmin = rays[:, 6:7]

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < 1e-12, jnp.where(c < 0, -1e-12, 1e-12), c)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    # best-t starts at per-ray t_max (rays col 7) so closest-hit honors
    # bounded queries (same contract as pallas_intersect._closest_kernel).
    init = jnp.concatenate(
        [
            jnp.minimum(rays[:, 7:8], _BIG),
            jnp.zeros((RAY_TILE, 2), jnp.float32),
            jnp.full((RAY_TILE, 1), -1.0, jnp.float32),
        ],
        axis=1,
    )
    if any_hit:
        init = jnp.zeros((RAY_TILE, 4), jnp.float32)
    out_ref[:] = init

    def body(k, _):
        state = out_ref[:]
        best_t = state[:, 0:1] if not any_hit else rays[:, 7:8]
        # slab test rays vs cluster k (scalar reads from VMEM row k)
        lo_x = clusters_ref[k, 0]
        lo_y = clusters_ref[k, 1]
        lo_z = clusters_ref[k, 2]
        hi_x = clusters_ref[k, 3]
        hi_y = clusters_ref[k, 4]
        hi_z = clusters_ref[k, 5]
        t0x = (lo_x - ox) * ix
        t1x = (hi_x - ox) * ix
        t0y = (lo_y - oy) * iy
        t1y = (hi_y - oy) * iy
        t0z = (lo_z - oz) * iz
        t1z = (hi_z - oz) * iz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), tmin),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), best_t),
        )
        box_hit = near <= far  # [R, 1]
        cond = jnp.any(box_hit)
        if any_hit:
            cond = cond & jnp.logical_not(jnp.all(state[:, 0] > 0.0))

        @pl.when(cond)
        def _():
            # stream this cluster's triangle block into VMEM
            dma = pltpu.make_async_copy(
                tris_hbm.at[:, pl.ds(k * TRI_TILE, TRI_TILE)], tri_vmem, sem
            )
            dma.start()
            dma.wait()
            tris = tri_vmem[:]
            state2 = out_ref[:]
            if any_hit:
                hit, _, _, _ = _pairwise_mt(rays, tris, rays[:, 7:8])
                got = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)
                out_ref[:] = jnp.maximum(state2, jnp.broadcast_to(got, state2.shape))
            else:
                bt = state2[:, 0:1]
                hit, t, u, v = _pairwise_mt(rays, tris, bt)
                t_m = jnp.where(hit, t, _BIG)
                tile_best = jnp.min(t_m, axis=1, keepdims=True)
                got = tile_best[:, 0] < _BIG
                lane = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 1)
                lane_sel = jnp.min(
                    jnp.where(t_m <= tile_best, lane, TRI_TILE), axis=1
                )
                sel = lane == lane_sel[:, None]
                u_best = jnp.sum(jnp.where(sel, u, 0.0), axis=1)
                v_best = jnp.sum(jnp.where(sel, v, 0.0), axis=1)
                prim = (k * TRI_TILE + lane_sel).astype(jnp.float32)
                closer = got & (tile_best[:, 0] < state2[:, 0])
                out_ref[:] = jnp.stack(
                    [
                        jnp.where(closer, tile_best[:, 0], state2[:, 0]),
                        jnp.where(closer, u_best, state2[:, 1]),
                        jnp.where(closer, v_best, state2[:, 2]),
                        jnp.where(closer, prim, state2[:, 3]),
                    ],
                    axis=1,
                )

        return ()

    jax.lax.fori_loop(0, n_clusters, body, ())


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def run_clustered(rays, tris, clusters, any_hit, interpret=False):
    n_ray_tiles = rays.shape[0] // RAY_TILE
    n_clusters = clusters.shape[0]
    kernel = functools.partial(
        _cluster_kernel, n_clusters=n_clusters, any_hit=any_hit
    )
    return pl.pallas_call(
        kernel,
        grid=(n_ray_tiles,),
        in_specs=[
            pl.BlockSpec((RAY_TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # clusters, whole array
            pl.BlockSpec(memory_space=pl.ANY),       # tris stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (RAY_TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rays.shape[0], 4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, TRI_TILE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rays, clusters, tris)
