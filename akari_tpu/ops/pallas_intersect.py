"""Pallas TPU intersection kernels.

The Embree replacement (SURVEY.md §7 hard part #1) — but redesigned for a
vector machine instead of translating the reference's per-thread stack
traversal (ref: src/akari/kernel/bvh-accelerator.h:488-547). Mosaic has no
efficient per-lane row gather from a VMEM table (verified empirically), so
divergent per-lane BVH walks are a poor fit. Instead:

``intersect_pallas`` — dense *ray-stream* intersection: a (ray_tile x
tri_tile) grid where each step tests a [128-tri x 512-ray] block with
branchless Moeller-Trumbore on the VPU, reducing the running closest hit in
VMEM. Zero divergence, zero gathers, perfectly coalesced DMA: for small and
mid scenes this runs at compute speed-of-light and is used by the flagship
Cornell benchmark. Asymptotics for large scenes come from the ordered
log-depth BVH2 tree walk (pallas_tree.py, the r5 default above
DENSE_MAX_TRIS); the linear cluster-skip kernels (pallas_cluster.py)
remain as the instanced fallback, and the XLA threaded BVH serves CPU.

Data layout (round-4 transposed design — see core/v3.py for why):
**rays on LANES, fields on SUBLANES**. Rays are ``[8, N]`` (rows: ox oy oz
dx dy dz tmin tmax), triangles ``[Tpad, 16]`` (tris on sublanes; cols
v0.xyz e1.xyz e2.xyz + pad), outputs ``[4, N]`` (rows t, u, v, prim-bits).
Every host-side array is exactly tiled (T(8,128) with zero padding) so the
pack/unpack around the launch is pure dense traffic — the previous
``[N, 8]`` layout padded 8 lanes to 128 (16x HBM) and cost ~4 ms/bounce in
layout-conversion copies. Pairwise blocks inside the kernel are
``[TRI_TILE, RAY_TILE]`` (tris on sublanes, rays on lanes) and every
reduction is a sublane reduction yielding ``[1, R]`` rows that assign
straight into the output block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.v3 import V3
from .intersect import HIT_EPS, T_MAX, Hit

# 512 rays (lanes) x 128 tris (sublanes) per grid step: [128,512] f32
# intermediates (256 KB each, ~12 live) fit VMEM while amortizing per-step
# overhead over 4 lane-tiles of rays.
RAY_TILE = 512
TRI_TILE = 128
_BIG = np.float32(T_MAX)

# Set True to run kernels in the Pallas interpreter (CPU test suites).
INTERPRET = False


def _pairwise_mt_t(rays, tris, best_t):
    """[8, R] rays x [T, 16] tris -> per-pair (hit, t, u, v) as [T, R].

    ``best_t`` is [1, R]. Tris vary on sublanes, rays on lanes.
    """
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    tmin = rays[6:7, :]
    v0x, v0y, v0z = tris[:, 0:1], tris[:, 1:2], tris[:, 2:3]
    e1x, e1y, e1z = tris[:, 3:4], tris[:, 4:5], tris[:, 5:6]
    e2x, e2y, e2z = tris[:, 6:7], tris[:, 7:8], tris[:, 8:9]

    # pvec = d x e2  -> [T, R]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < HIT_EPS, 1.0, det)
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        (jnp.abs(det) >= HIT_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin)
        & (t < best_t)
    )
    return hit, t, u, v


def closest_update(state, rays, tris, tri_base):
    """One [T, R] Moeller-Trumbore sweep folded into the running state.

    ``state`` is the [4, R] (t, u, v, prim) block; returns the new state.
    Shared by the dense and the cluster-skip kernels.
    """
    best_t = state[0:1, :]
    hit, t, u, v = _pairwise_mt_t(rays, tris, best_t)
    t_m = jnp.where(hit, t, _BIG)
    tile_best = jnp.min(t_m, axis=0, keepdims=True)       # [1, R]
    n_tris = t_m.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 0)
    row_sel = jnp.min(
        jnp.where(t_m <= tile_best, row, n_tris), axis=0, keepdims=True
    )                                                     # [1, R]
    sel = row == row_sel
    u_best = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
    v_best = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
    prim = (tri_base + row_sel).astype(jnp.float32)
    closer = tile_best < best_t                           # [1, R]
    return jnp.concatenate(
        [
            jnp.where(closer, tile_best, state[0:1, :]),
            jnp.where(closer, u_best, state[1:2, :]),
            jnp.where(closer, v_best, state[2:3, :]),
            jnp.where(closer, prim, state[3:4, :]),
        ],
        axis=0,
    )


def init_state(rays):
    """[4, R] initial (t=t_max, u=0, v=0, prim=-1) from a [8, R] ray block.

    best-t starts at the per-ray t_max (row 7): hits beyond it never
    register, so closest-hit honors bounded queries (the fused
    shadow+extension launch in integrators/path.py relies on this)."""
    r = rays.shape[1]
    return jnp.concatenate(
        [
            jnp.minimum(rays[7:8, :], _BIG),
            jnp.zeros((2, r), jnp.float32),
            jnp.full((1, r), -1.0, jnp.float32),
        ],
        axis=0,
    )


def _closest_kernel(rays_ref, tris_ref, out_ref, tri_tile=TRI_TILE):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = init_state(rays_ref[:])

    out_ref[:] = closest_update(
        out_ref[:], rays_ref[:], tris_ref[:], j * tri_tile
    )


def _anyhit_kernel(rays_ref, tris_ref, out_ref, tri_tile=TRI_TILE):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rays = rays_ref[:]
    hit, _, _, _ = _pairwise_mt_t(rays, tris_ref[:], rays[7:8, :])
    any_row = jnp.max(hit.astype(jnp.float32), axis=0, keepdims=True)
    out_ref[:] = jnp.maximum(out_ref[:], any_row)


def _pack_rays_soa(o, d, t_min, t_max, xp=jnp, ray_tile=None):
    """V3 o, V3 d, [N] t_min/t_max -> ([8, Npad], n). Zero padding: d = 0
    rays have det = 0 and never hit."""
    n = o.x.shape[0]
    pad = (-n) % (ray_tile or RAY_TILE)
    rays = xp.stack(
        xp.broadcast_arrays(
            o.x, o.y, o.z, d.x, d.y, d.z,
            xp.asarray(t_min, xp.float32), xp.asarray(t_max, xp.float32),
        ),
        axis=0,
    )
    if pad:
        rays = xp.concatenate(
            [rays, xp.zeros((8, pad), xp.float32)], axis=1
        )
    return rays, n


def pack_tris_t(tri_v0, tri_e1, tri_e2):
    """[T,3] x3 -> [16, Tpad] (fields on sublanes, tris on LANES): the
    HBM-resident store for the cluster/instanced kernels, whose manual
    DMAs slice 128-aligned lane runs. Minor dim Tpad is exactly tiled
    (a [Tpad, 16] store would lane-pad 8x in HBM)."""
    t = tri_v0.shape[0]
    pad = (-t) % TRI_TILE
    fields = jnp.concatenate(
        [tri_v0, tri_e1, tri_e2, jnp.zeros((t, 7), jnp.float32)], axis=1
    ).T  # [16, T]
    if pad:
        fields = jnp.concatenate(
            [fields, jnp.zeros((16, pad), jnp.float32)], axis=1
        )
    return fields


def pack_tris(tri_v0, tri_e1, tri_e2, tri_tile=TRI_TILE):
    """Host/trace-time packing: [T,3] x3 -> [Tpad, 16] SoA (tris on
    sublanes). Padded rows are all-zero (degenerate, never hit)."""
    t = tri_v0.shape[0]
    pad = (-t) % tri_tile
    fields = jnp.concatenate(
        [tri_v0, tri_e1, tri_e2, jnp.zeros((t, 7), jnp.float32)], axis=1
    )  # [T, 16]
    if pad:
        fields = jnp.concatenate(
            [fields, jnp.zeros((pad, 16), jnp.float32)], axis=0
        )
    return fields


@functools.partial(
    jax.jit, static_argnames=("any_hit", "interpret", "ray_tile", "tri_tile")
)
def _run(rays, tris, any_hit, interpret=False, ray_tile=RAY_TILE,
         tri_tile=TRI_TILE):
    n_ray_tiles = rays.shape[1] // ray_tile
    n_tri_tiles = tris.shape[0] // tri_tile
    kernel = functools.partial(
        _anyhit_kernel if any_hit else _closest_kernel, tri_tile=tri_tile
    )
    out_rows = 1 if any_hit else 4
    grid = (n_ray_tiles, n_tri_tiles)
    return pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(
                (8, ray_tile), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tri_tile, 16), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, ray_tile), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows, rays.shape[1]), jnp.float32),
    )(rays, tris)


# Above this triangle count the dense all-pairs sweep loses to the
# cluster-skip kernel (which only streams AABB-hit triangle blocks).
DENSE_MAX_TRIS = 4096


def _sort_keys_soa(o, d, lo, hi, xp=jnp, t_min=None, t_max=None,
                   hint="primary"):
    """Coherence sort key per ray:
    direction octant (3b, major) | direction Morton | origin Morton.

    The tile kernels cull at (ray tile x AABB) granularity, so their cost
    is driven by how many AABBs *any* ray of a tile enters; the sort is
    what makes tiles compact. The bit split adapts to the ray population
    (measured on the 522k-tri terrain, r5):

    - ``primary`` (camera rays: ONE shared origin): 4 dir bits/axis over
      5 origin bits/axis. The r4 origin-only key made "sorted" primary
      tiles image-row strips with enormous frusta (440 pops / 136 leaf
      visits per tile vs 190/56 with direction bits - 3.5x faster
      closest-hit stage).
    - ``secondary`` (bounce/shadow rays: origins spread over the scene):
      1 dir bit/axis over 8 origin bits/axis. A hemisphere of directions
      from one origin cell touches few leaves near the cell, so origin
      locality dominates (185 -> 60 ms on a hemisphere-ray closest
      stage vs the primary split). The octant stays major either way:
      the tree walk orders children by the TILE octant, and
      mixed-octant tiles mis-order near/far and lose best-t pruning
      (origin-major keys measured 2x slower than octant-major).

    DEAD rays (t_max <= t_min - the wavefront inactive lanes) get the
    maximal key so they concentrate in tail tiles, which the tree walk
    terminates at the root (their best_t <= tmin fails every slab)."""
    dbits, obits = (1, 8) if hint == "secondary" else (4, 5)
    ext = xp.maximum(hi - lo, 1e-6)
    m = xp.zeros(o.x.shape, xp.uint32)
    for a, (oc, loc, extc) in enumerate(
        [(o.x, lo[0], ext[0]), (o.y, lo[1], ext[1]), (o.z, lo[2], ext[2])]
    ):
        q = (
            xp.clip((oc - loc) / extc, 0.0, 1.0) * (2.0 ** obits - 1.0)
        ).astype(xp.uint32)
        for b in range(obits):
            m = m | (((q >> b) & 1) << (3 * b + a))
    dm = xp.zeros(o.x.shape, xp.uint32)
    for a, dc in enumerate([d.x, d.y, d.z]):
        q = (
            xp.clip(xp.abs(dc), 0.0, 0.99999) * (2.0 ** dbits - 1.0)
        ).astype(xp.uint32)
        for b in range(dbits):
            dm = dm | (((q >> b) & 1) << (3 * b + a))
    octant = (
        (d.x < 0).astype(xp.uint32)
        | ((d.y < 0).astype(xp.uint32) << 1)
        | ((d.z < 0).astype(xp.uint32) << 2)
    )
    key = (octant << (3 * (dbits + obits))) | (dm << (3 * obits)) | m
    if t_min is not None and t_max is not None:
        key = xp.where(
            xp.asarray(t_max) <= xp.asarray(t_min),
            xp.uint32(0xFFFFFFFF), key,
        )
    return key


def _unpack_closest(out):
    t, u, v, prim_f = out[0], out[1], out[2], out[3]
    valid = (prim_f >= 0.0) & (t < _BIG)
    # prim was stored as float (exact for < 2^24 tris)
    prim = jnp.where(valid, prim_f.astype(jnp.int32), -1)
    return jnp.where(valid, t, _BIG), prim, u, v, valid


def intersect_pallas_instanced(scene, o, d, t_min, t_max, any_hit=False,
                               hint="primary"):
    """Two-level instanced ray-stream entry. Prefers the per-prototype
    ordered tree walk (ops/pallas_tree.run_instanced_tree, r5); scenes
    compiled without tree tables fall back to the linear supercluster
    BLAS (ops/pallas_cluster.run_instanced). Same signature/results as
    intersect_pallas_soa; hits carry VIRTUAL prim ids."""
    instf = jnp.asarray(scene.inst_pallas_f32)
    lo = jnp.min(instf[:, 0:3], axis=0)
    hi = jnp.max(instf[:, 3:6], axis=0)
    order = jnp.argsort(
        _sort_keys_soa(o, d, lo, hi, t_min=t_min, t_max=t_max, hint=hint)
    )
    take = lambda a: jnp.take(a, order)
    o_s = V3(take(o.x), take(o.y), take(o.z))
    d_s = V3(take(d.x), take(d.y), take(d.z))
    rays, n = _pack_rays_soa(o_s, d_s, take(t_min), take(t_max))
    if scene.tri_tree is not None:
        from .pallas_tree import run_instanced_tree

        out_sorted = run_instanced_tree(
            rays, instf, jnp.asarray(scene.inst_pallas_i32),
            jnp.asarray(scene.tri_tree),
            jnp.asarray(scene.inst_tris16),
            any_hit, leaf_span=scene.tree_leaf_span, interpret=INTERPRET,
        )
    else:
        from .pallas_cluster import run_instanced

        out_sorted = run_instanced(
            rays, instf, jnp.asarray(scene.inst_pallas_i32),
            jnp.asarray(scene.tri_superclusters),
            jnp.asarray(scene.tri_clusters),
            jnp.asarray(scene.inst_tris16),
            any_hit, interpret=INTERPRET,
        )
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype)
    )
    out = jnp.take(out_sorted[:, :n], inv, axis=1)
    if any_hit:
        return out[0] > 0.5
    return _unpack_closest(out)


def intersect_pallas_soa(scene, o, d, t_min, t_max, any_hit=False,
                         hint="primary"):
    """Component-SoA entry: V3 o/d, [N] t_min/t_max.

    Returns ``occluded [N] bool`` (any_hit) or ``(t, prim, u, v, valid)``
    all [N].
    """
    if scene.instances is not None:
        return intersect_pallas_instanced(
            scene, o, d, t_min, t_max, any_hit, hint=hint
        )
    # Small scenes: shrink the tri tile to the 8-sublane roundup of the
    # real count — a 36-tri Cornell tests 40 padded tris per block
    # instead of 128 (3.2x less wasted MT work per grid step).
    n_tris = int(scene.tri_v0.shape[0])
    tri_tile = TRI_TILE if n_tris > 512 else max(8, -(-n_tris // 8) * 8)
    if (
        scene.tri_v0.shape[0] > DENSE_MAX_TRIS
        and scene.tri_clusters is not None
        and scene.tri_superclusters is not None
    ):
        supers = jnp.asarray(scene.tri_superclusters)
        # coherence sort so each 512-ray tile spans few cluster AABBs
        lo = jnp.min(supers[:, 0:3], axis=0)
        hi = jnp.max(supers[:, 3:6], axis=0)
        order = jnp.argsort(
            _sort_keys_soa(o, d, lo, hi, t_min=t_min, t_max=t_max, hint=hint)
        )
        take = lambda a: jnp.take(a, order)
        o_s = V3(take(o.x), take(o.y), take(o.z))
        d_s = V3(take(d.x), take(d.y), take(d.z))
        n_clusters = (int(scene.tri_v0.shape[0]) + TRI_TILE - 1) // TRI_TILE
        if scene.tri_tree is not None:
            from .pallas_tree import TREE_RAY_TILE, run_tree

            rays, n = _pack_rays_soa(
                o_s, d_s, take(t_min), take(t_max), ray_tile=TREE_RAY_TILE
            )

            trees_t = (
                jnp.asarray(scene.tri_blocks)
                if scene.tri_blocks is not None
                else pack_tris_t(scene.tri_v0, scene.tri_e1, scene.tri_e2)
            )
            out_sorted = run_tree(
                rays, trees_t, jnp.asarray(scene.tri_tree), any_hit,
                n_clusters=n_clusters, leaf_span=scene.tree_leaf_span,
                interpret=INTERPRET,
            )
        else:
            from .pallas_cluster import run_clustered

            rays, n = _pack_rays_soa(o_s, d_s, take(t_min), take(t_max))
            tris = pack_tris_t(scene.tri_v0, scene.tri_e1, scene.tri_e2)
            out_sorted = run_clustered(
                rays, tris, jnp.asarray(scene.tri_clusters), supers,
                any_hit, n_tris=int(scene.tri_v0.shape[0]),
                interpret=INTERPRET,
            )
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype)
        )
        out = jnp.take(out_sorted[:, :n], inv, axis=1)
    else:
        rays, n = _pack_rays_soa(o, d, t_min, t_max)
        tris = pack_tris(
            scene.tri_v0, scene.tri_e1, scene.tri_e2, tri_tile=tri_tile
        )
        out = _run(
            rays, tris, any_hit, interpret=INTERPRET, tri_tile=tri_tile
        )[:, :n]
    if any_hit:
        return out[0] > 0.5
    return _unpack_closest(out)


def intersect_pallas(scene, o, d, t_min, t_max, any_hit=False):
    """AoS wrapper ([N,3] o/d -> Hit) for the generic dispatch
    (ops.intersect) and the AoS integrators (BDPT/AO)."""
    o3 = V3(o[..., 0], o[..., 1], o[..., 2])
    d3 = V3(d[..., 0], d[..., 1], d[..., 2])
    res = intersect_pallas_soa(scene, o3, d3, t_min, t_max, any_hit)
    if any_hit:
        return res
    t, prim, u, v, valid = res
    return Hit(t, prim, jnp.stack([u, v], -1), valid)
