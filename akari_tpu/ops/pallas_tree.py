"""Ordered log-depth Pallas traversal: a BVH2 over triangle clusters
walked per ray-tile with an SMEM stack.

This is the logarithmic accelerator the round-4 supercluster walk lacked
(ref: src/akari/kernel/bvh-accelerator.h:488-547 — the reference's
stack-based near/far-ordered traversal — rebuilt at ray-*tile*
granularity for a vector machine). The linear kernel's cost was
~K/SUPER outer steps regardless of what a tile could prove it misses;
here a tile descends only into AABB-hit subtrees, visits children
front-to-back along the tile's dominant direction octant, and prunes
against the *live* per-ray best-t state, so far subtrees pushed early
are usually culled by the time they pop.

Hierarchy (host build, `build_cluster_tree`):

  triangle -> cluster  = TRI_TILE (128) consecutive BVH-ordered triangles
  cluster  -> leaf     = LEAF_SPAN consecutive clusters (span picked so
                         the node table fits its VMEM budget)
  leaf     -> BVH2     = binned-SAH binary tree, one node row per split

Node row layout ([N, 16] f32 — everything packed in one row so VMEM
costs 512 B/node under the (8,128) tiling and the walk needs only
dynamic-*sublane* scalar reads, which Mosaic lowers well):

  0:3  child0 lo   3:6  child0 hi   6:9  child1 lo   9:12 child1 hi
  12   child0 ref  13   child1 ref  14   split axis  15   pad

A ref >= 0 is an inner-node row index; ref < 0 encodes leaf block
``-ref - 1`` (refs are exact in f32 below 2^24 nodes). child0 is the
lower child along the split axis, so "visit near first" is one sign
test on the tile's representative ray (tiles are octant-major sorted by
``pallas_intersect._sort_keys_soa``).

Per 512-ray tile the walk is a ``lax.while_loop`` over an SMEM stack of
refs: pop; two [1, R] slab tests against the running best-t; push far
then near (gated bumps of the stack pointer — writes are unconditional
into free slots); leaf pops DMA their 128-triangle SoA blocks from HBM
([16, T] store, lane-aligned slices) and fold a dense Moeller-Trumbore
block into the [4, R] state. Any-hit walks set per-ray best-t to -1
once occluded (prunes them from every later slab test) and terminate
the loop when the whole tile is occluded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_intersect import (
    RAY_TILE,
    TRI_TILE,
    _pairwise_mt_t,
    closest_update,
    init_state,
)

# Ray-tile width of the flat tree walk. Wider tiles amortize the serial
# per-pop scalar work (stack ops, node reads, reduces) over more rays at
# the cost of slightly less coherent tiles and 2x the vector slab work
# per pop; subtiles stay 128 rays. Must be a multiple of 128; > 512 uses
# two bucket-sums per child for the subtile masks (8x8-bit > int32).
# A/B on the 522k-tri terrain frame (r5): 1024 gained only 1.4% — the
# extra vector slab work and the second bucket reduce eat the scalar
# amortization — so 512 stays.
TREE_RAY_TILE = 512

# SMEM ref stack depth. The builder forces median splits beyond depth 30,
# so tree depth <= ~30 + log2(n_leaves) and DFS stack depth <= depth + 1.
STACK_DEPTH = 64

# VMEM budget for the node table (512 B/node under (8,128) tiling).
# 9 MB => <= 18432 nodes; LEAF_SPAN grows on bigger scenes to stay under.
# Raised from 6 MB in r5 so a 2.09M-tri scene (16.3k clusters) keeps
# leaf_span=1 (measured +11% vs span 2); the kernel's other VMEM is
# small (rays + [128,512] MT temps ~2 MB), so ~11 MB total still fits.
NODE_BUDGET_BYTES = 9 * 1024 * 1024
_MAX_NODES = NODE_BUDGET_BYTES // 512

# Force median splits below this depth so stack depth stays bounded.
_FORCE_MEDIAN_DEPTH = 30


def pick_leaf_span(n_clusters):
    """Smallest power-of-two cluster span whose tree fits NODE_BUDGET."""
    span = 1
    while (n_clusters + span - 1) // span > _MAX_NODES:
        span *= 2
    return span


def build_cluster_tree(clusters, n_tris, leaf_span=None):
    """Host-side: BVH2 node table over LEAF_SPAN-cluster blocks.

    ``clusters`` is the [Kpad, 8] table from
    ``pallas_cluster.build_clusters`` (rows: lo.xyz, hi.xyz, pad, pad;
    already epsilon-padded). Returns (nodes [Npad, 16] f32, leaf_span).
    """
    k = (int(n_tris) + TRI_TILE - 1) // TRI_TILE
    cl = np.asarray(clusters, np.float64)
    lo_c, hi_c = cl[:k, 0:3], cl[:k, 3:6]
    if leaf_span is None:
        leaf_span = pick_leaf_span(k)
    b = (k + leaf_span - 1) // leaf_span
    pad = b * leaf_span - k
    if pad:
        lo_c = np.concatenate([lo_c, np.full((pad, 3), np.inf)])
        hi_c = np.concatenate([hi_c, np.full((pad, 3), -np.inf)])
    lo = lo_c.reshape(b, leaf_span, 3).min(axis=1)
    hi = hi_c.reshape(b, leaf_span, 3).max(axis=1)

    nodes = []

    def make_row(l_lo, l_hi, r_lo, r_hi, lref, rref, axis):
        row = np.zeros(16, np.float64)
        row[0:3], row[3:6] = l_lo, l_hi
        row[6:9], row[9:12] = r_lo, r_hi
        row[12], row[13], row[14] = lref, rref, axis
        return row

    if b == 1:
        # Degenerate root: child1 is an inverted never-hit box.
        nodes.append(
            make_row(lo[0], hi[0], np.full(3, 1e30), np.full(3, -1e30),
                     -1, -1, 0)
        )
    else:
        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 10000))
        try:
            _tree_rec(np.arange(b), lo, hi, nodes, 0)
        finally:
            sys.setrecursionlimit(old)

    assert len(nodes) < (1 << 24), "node refs must stay exact in f32"
    out = np.stack(nodes).astype(np.float32)
    npad = (-out.shape[0]) % 8
    if npad:
        out = np.concatenate([out, np.zeros((npad, 16), np.float32)])
    return out, int(leaf_span)


def _tree_rec(ids, lo, hi, nodes, depth):
    """Recursive binned-SAH build over leaf-block boxes; returns a ref.

    Child0 is the lower side along the split axis (the kernel's near/far
    ordering relies on this).
    """
    if ids.shape[0] == 1:
        return -(int(ids[0]) + 1)
    idx = len(nodes)
    nodes.append(None)
    l = lo[ids]
    h = hi[ids]
    c = (l + h) * 0.5
    ext = c.max(axis=0) - c.min(axis=0)
    axis = int(np.argmax(ext))
    go_left = None
    if depth < _FORCE_MEDIAN_DEPTH and ext[axis] > 1e-12 and ids.shape[0] > 2:
        from ..bvh.build import _object_split

        obj = _object_split(ids, l, h, c)
        if obj is not None:
            _, gl, _, _ = obj
            if gl.any() and not gl.all():
                go_left = gl
    if go_left is None:
        order = np.argsort(c[:, axis], kind="stable")
        go_left = np.zeros(ids.shape[0], bool)
        go_left[order[: ids.shape[0] // 2]] = True
    li, ri = ids[go_left], ids[~go_left]
    lref = _tree_rec(li, lo, hi, nodes, depth + 1)
    rref = _tree_rec(ri, lo, hi, nodes, depth + 1)
    nodes[idx] = _row_of(lo, hi, li, ri, lref, rref, axis)
    return idx


def _row_of(lo, hi, li, ri, lref, rref, axis):
    row = np.zeros(16, np.float64)
    row[0:3] = lo[li].min(axis=0)
    row[3:6] = hi[li].max(axis=0)
    row[6:9] = lo[ri].min(axis=0)
    row[9:12] = hi[ri].max(axis=0)
    row[12], row[13], row[14] = lref, rref, axis
    return row


def _tree_kernel(rays_ref, nodes_ref, tris_hbm, out_ref, tri_vmem,
                 stack_ref, pend_ref, sem, *, n_clusters, leaf_span,
                 any_hit, stats=False):
    """Grid: (n_ray_tiles,). Nodes + rays in VMEM, tris stream from HBM."""
    rays = rays_ref[:]  # [8, R]
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    tmin = rays[6:7, :]

    def inv(c):
        return 1.0 / jnp.where(
            jnp.abs(c) < 1e-12, jnp.where(c < 0, -1e-12, 1e-12), c
        )

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    base_rows = 1 if any_hit else 4
    if any_hit:
        out_ref[0:1, :] = jnp.zeros((1, TREE_RAY_TILE), jnp.float32)
    else:
        out_ref[0:4, :] = init_state(rays)

    # Near-child ordering: the tile's dominant direction sign per axis
    # (tiles are direction-octant sorted; ray 0 represents the tile).
    dneg_x = rays_ref[3, 0] < 0.0
    dneg_y = rays_ref[4, 0] < 0.0
    dneg_z = rays_ref[5, 0] < 0.0

    def best_t_now():
        if any_hit:
            # occluded rays get best_t = -1: no box can pass near <= far,
            # so finished rays stop driving descent.
            return jnp.where(out_ref[0:1, :] > 0.0, -1.0, rays[7:8, :])
        return out_ref[0:1, :]

    def slab_mask(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, best_t):
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
        # best_t > tmin culls DEAD lanes (t_max = 0 from the wavefront's
        # inactive-lane masking): their degenerate 0 <= 0 slab would
        # otherwise descend into every box containing the stale origin.
        # Live lanes always satisfy it (hits require t > tmin).
        return (near <= far) & (best_t > tmin)

    # Subtile machinery: per-pop the slab masks are folded into per-child
    # bucket sums (one cross-lane reduce each; 128-ray bucket counts stay
    # exact in 8 bits), giving a 4-bit which-subtiles-hit mask that rides
    # the stack entry. Leaf pops then run the dense Moeller-Trumbore only
    # on hit 128-ray subtiles — most leaf clusters are entered by a small
    # fraction of the tile, so this cuts the dominant leaf VPU work 2-4x.
    n_sub = TREE_RAY_TILE // 128
    mask_bits = n_sub
    sub_id = jax.lax.broadcasted_iota(
        jnp.int32, (1, TREE_RAY_TILE), 1
    ) >> 7
    # per-128-ray-subtile hit counts ride bucket sums (8-bit buckets are
    # exact: counts <= 128); > 4 subtiles need two sums per child.
    w_all = jnp.int32(1) << ((sub_id % 4) * 8)
    sub_w_lo = jnp.where(sub_id < 4, w_all, 0)
    sub_w_hi = jnp.where(sub_id >= 4, w_all, 0)

    def _decode4(sv):
        m = jnp.int32(0)
        for j in range(min(n_sub, 4)):
            m = m | (
                (((sv >> (8 * j)) & 255) > 0).astype(jnp.int32) << j
            )
        return m

    def child_mask(m):
        s_lo = jnp.sum(m.astype(jnp.int32) * sub_w_lo)
        if n_sub <= 4:
            return _decode4(s_lo)
        s_hi = jnp.sum(m.astype(jnp.int32) * sub_w_hi)
        return _decode4(s_lo) | (_decode4(s_hi) << 4)

    def entry_of(c, mask):
        # Stack entry: inner = node index;
        # leaf = -(1 + (block << mask_bits | mask)).
        return jnp.where(
            c >= 0, c, -(1 + (((-c - 1) << mask_bits) | mask))
        )

    def cond(carry):
        sp, done, pops, leaves = carry
        return (sp > 0) & jnp.logical_not(done)

    def body(carry):
        sp, done, pops, leaves = carry
        pops = pops + 1
        sp = sp - 1
        ref = stack_ref[sp]
        inner = ref >= 0
        nref = jnp.where(inner, ref, 0)
        c0 = nodes_ref[nref, 12].astype(jnp.int32)
        c1 = nodes_ref[nref, 13].astype(jnp.int32)
        ax = nodes_ref[nref, 14].astype(jnp.int32)
        bt = best_t_now()
        m0 = slab_mask(
            nodes_ref[nref, 0], nodes_ref[nref, 1], nodes_ref[nref, 2],
            nodes_ref[nref, 3], nodes_ref[nref, 4], nodes_ref[nref, 5], bt,
        )
        m1 = slab_mask(
            nodes_ref[nref, 6], nodes_ref[nref, 7], nodes_ref[nref, 8],
            nodes_ref[nref, 9], nodes_ref[nref, 10], nodes_ref[nref, 11], bt,
        )
        mask0 = child_mask(m0)
        mask1 = child_mask(m1)
        h0 = mask0 > 0
        h1 = mask1 > 0
        ent0 = entry_of(c0, mask0)
        ent1 = entry_of(c1, mask1)
        dneg = jnp.where(
            ax == 0, dneg_x, jnp.where(ax == 1, dneg_y, dneg_z)
        )
        near_r = jnp.where(dneg, ent1, ent0)
        far_r = jnp.where(dneg, ent0, ent1)
        near_h = jnp.where(dneg, h1, h0) & inner
        far_h = jnp.where(dneg, h0, h1) & inner
        # Unconditional writes into free slots; only the sp bumps gate.
        # Far first so near pops first (front-to-back).
        stack_ref[sp] = far_r
        sp = sp + far_h.astype(jnp.int32)
        stack_ref[sp] = near_r
        sp = sp + near_h.astype(jnp.int32)

        @pl.when(jnp.logical_not(inner))
        def _():
            v = -ref - 1
            blk = v >> mask_bits
            lmask = v & ((1 << mask_bits) - 1)
            for j in range(leaf_span):
                k = blk * leaf_span + j

                @pl.when(k < n_clusters)
                def _():
                    # 1-deep leaf pipeline: consume the PREVIOUS leaf's
                    # block (its DMA has been in flight across the inner
                    # pops since it was discovered), then start this
                    # leaf's DMA and record it as pending — the copy
                    # overlaps all traversal work until the next leaf
                    # pops. [16, T] HBM store: lane-aligned DMA slice + a
                    # small [16, 128] transpose in VMEM (a direct
                    # [128, 16] block DMA is impossible: Mosaic requires
                    # 128-aligned minor-dim slices).
                    _process_pending()
                    dma = pltpu.make_async_copy(
                        tris_hbm.at[:, pl.ds(k * TRI_TILE, TRI_TILE)],
                        tri_vmem, sem,
                    )
                    dma.start()
                    pend_ref[0] = k
                    pend_ref[1] = lmask

        leaves = leaves + jnp.where(inner, 0, 1)
        if any_hit:
            # may lag the pending leaf by one — the final drain below
            # completes the state before any output is read
            done = jnp.all(out_ref[0, :] > 0.0)
        return sp, done, pops, leaves

    def _mt_block(kp, lmask_p):
        tris = jnp.transpose(tri_vmem[:])
        for st in range(n_sub):

            @pl.when(((lmask_p >> st) & 1) > 0)
            def _():
                sl = slice(st * 128, (st + 1) * 128)
                rb = rays[:, sl]
                if any_hit:
                    hit, _, _, _ = _pairwise_mt_t(rb, tris, rb[7:8, :])
                    got = jnp.max(
                        hit.astype(jnp.float32), axis=0, keepdims=True
                    )
                    out_ref[0:1, sl] = jnp.maximum(out_ref[0:1, sl], got)
                else:
                    out_ref[0:4, sl] = closest_update(
                        out_ref[0:4, sl], rb, tris, kp * TRI_TILE
                    )

    def _process_pending():
        kp = pend_ref[0]

        @pl.when(kp >= 0)
        def _():
            pltpu.make_async_copy(
                tris_hbm.at[:, pl.ds(kp * TRI_TILE, TRI_TILE)],
                tri_vmem, sem,
            ).wait()
            _mt_block(kp, pend_ref[1])
            pend_ref[0] = -1

    stack_ref[0] = jnp.int32(0)
    pend_ref[0] = jnp.int32(-1)
    pend_ref[1] = jnp.int32(0)
    _, _, pops, leaves = jax.lax.while_loop(
        cond, body, (jnp.int32(1), jnp.bool_(False), jnp.int32(0),
                     jnp.int32(0))
    )
    _process_pending()  # drain the last in-flight leaf
    if stats:
        out_ref[base_rows:base_rows + 1, :] = jnp.full(
            (1, TREE_RAY_TILE), pops.astype(jnp.float32)
        )
        out_ref[base_rows + 1:base_rows + 2, :] = jnp.full(
            (1, TREE_RAY_TILE), leaves.astype(jnp.float32)
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "any_hit", "n_clusters", "leaf_span", "interpret", "stats"
    ),
)
def run_tree(rays, tris, nodes, any_hit, n_clusters, leaf_span,
             interpret=False, stats=False):
    """Tree-walk launch. rays [8, Npad]; tris [16, Tpad] (pack_tris_t);
    nodes [Nn, 16] from build_cluster_tree. ``stats=True`` appends two
    output rows: per-tile pop and leaf-visit counts (tuning/diagnostics).
    """
    n_ray_tiles = rays.shape[1] // TREE_RAY_TILE
    kernel = functools.partial(
        _tree_kernel, n_clusters=n_clusters, leaf_span=leaf_span,
        any_hit=any_hit, stats=stats,
    )
    out_rows = (1 if any_hit else 4) + (2 if stats else 0)
    return pl.pallas_call(
        kernel,
        grid=(n_ray_tiles,),
        in_specs=[
            pl.BlockSpec((8, TREE_RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # node table
            pl.BlockSpec(memory_space=pl.ANY),       # tris stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (out_rows, TREE_RAY_TILE), lambda i: (0, i),
            memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (out_rows, rays.shape[1]), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((16, TRI_TILE), jnp.float32),
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),   # pending leaf (k, subtile mask)
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rays, nodes, tris)


def _instanced_tree_kernel(rays_ref, instf_ref, insti_ref, nodes_ref,
                           tris_hbm, out_ref, tri_vmem, stack_ref, sem, *,
                           n_inst, leaf_span, any_hit):
    """Two-level instanced tree walk (r5 upgrade of pallas_cluster's
    linear run_instanced): per instance, cull the ray tile against the
    instance WORLD AABB, transform the tile into object space (affine
    w2o, direction unnormalized so the t parameter is world-shared and
    best-t pruning works globally), then run the same ordered BVH2 walk
    over the prototype's node range. Hits record VIRTUAL prim ids
    (prim_base + local storage index; see scene/geom.py).

    instf_ref [I, 20] f32: world lo(0:3) hi(3:6), w2o rows (6:18), pad.
    insti_ref [I, 8] i32: (_, _, _, n_clusters, tile_base, prim_base,
    tree_base, _) — slots 0..2 are the legacy linear-kernel bases.
    """
    rays = rays_ref[:]  # [8, R] world
    wox, woy, woz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    wdx, wdy, wdz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    tmin = rays[6:7, :]

    def inv(c):
        return 1.0 / jnp.where(
            jnp.abs(c) < 1e-12, jnp.where(c < 0, -1e-12, 1e-12), c
        )

    iwx, iwy, iwz = inv(wdx), inv(wdy), inv(wdz)

    if any_hit:
        out_ref[0:1, :] = jnp.zeros((1, RAY_TILE), jnp.float32)
    else:
        out_ref[0:4, :] = init_state(rays)

    n_sub = RAY_TILE // 128
    sub_id = jax.lax.broadcasted_iota(jnp.int32, (1, RAY_TILE), 1) >> 7
    sub_w = jnp.int32(1) << (sub_id * 8)

    def subtile_mask(s):
        m = jnp.int32(0)
        for j in range(n_sub):
            m = m | (
                (((s >> (8 * j)) & 255) > 0).astype(jnp.int32) << j
            )
        return m

    def entry_of(c, mask):
        return jnp.where(c >= 0, c, -(1 + (((-c - 1) << 4) | mask)))

    def best_t_now():
        if any_hit:
            return jnp.where(out_ref[0:1, :] > 0.0, -1.0, rays[7:8, :])
        return out_ref[0:1, :]

    def world_slab_any(i):
        lo_x, lo_y, lo_z = instf_ref[i, 0], instf_ref[i, 1], instf_ref[i, 2]
        hi_x, hi_y, hi_z = instf_ref[i, 3], instf_ref[i, 4], instf_ref[i, 5]
        bt = best_t_now()
        t0x = (lo_x - wox) * iwx
        t1x = (hi_x - wox) * iwx
        t0y = (lo_y - woy) * iwy
        t1y = (hi_y - woy) * iwy
        t0z = (lo_z - woz) * iwz
        t1z = (hi_z - woz) * iwz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), tmin),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), bt),
        )
        return jnp.any((near <= far) & (bt > tmin))

    def inst_body(i, _):
        @pl.when(world_slab_any(i))
        def _():
            m = [instf_ref[i, 6 + c] for c in range(12)]
            ox = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
            oy = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
            oz = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
            dx = m[0] * wdx + m[1] * wdy + m[2] * wdz
            dy = m[4] * wdx + m[5] * wdy + m[6] * wdz
            dz = m[8] * wdx + m[9] * wdy + m[10] * wdz
            ix, iy, iz = inv(dx), inv(dy), inv(dz)
            orays = jnp.concatenate(
                [ox, oy, oz, dx, dy, dz, tmin, rays[7:8, :]], axis=0
            )
            n_cl = insti_ref[i, 3]
            tile_base = insti_ref[i, 4]
            prim_base = insti_ref[i, 5]
            tree_base = insti_ref[i, 6]
            # tile-representative OBJECT-space direction signs (scalars)
            rdx = rays_ref[3, 0]
            rdy = rays_ref[4, 0]
            rdz = rays_ref[5, 0]
            dneg_x = (m[0] * rdx + m[1] * rdy + m[2] * rdz) < 0.0
            dneg_y = (m[4] * rdx + m[5] * rdy + m[6] * rdz) < 0.0
            dneg_z = (m[8] * rdx + m[9] * rdy + m[10] * rdz) < 0.0

            def slab_mask(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, bt):
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
                    jnp.minimum(jnp.maximum(t0z, t1z), bt),
                )
                return (near <= far) & (bt > tmin)

            def cond(carry):
                sp, done = carry
                return (sp > 0) & jnp.logical_not(done)

            def body(carry):
                sp, done = carry
                sp = sp - 1
                ref = stack_ref[sp]
                inner = ref >= 0
                nref = tree_base + jnp.where(inner, ref, 0)
                c0 = nodes_ref[nref, 12].astype(jnp.int32)
                c1 = nodes_ref[nref, 13].astype(jnp.int32)
                ax = nodes_ref[nref, 14].astype(jnp.int32)
                bt = best_t_now()
                m0 = slab_mask(
                    nodes_ref[nref, 0], nodes_ref[nref, 1],
                    nodes_ref[nref, 2], nodes_ref[nref, 3],
                    nodes_ref[nref, 4], nodes_ref[nref, 5], bt,
                )
                m1 = slab_mask(
                    nodes_ref[nref, 6], nodes_ref[nref, 7],
                    nodes_ref[nref, 8], nodes_ref[nref, 9],
                    nodes_ref[nref, 10], nodes_ref[nref, 11], bt,
                )
                s0 = jnp.sum(m0.astype(jnp.int32) * sub_w)
                s1 = jnp.sum(m1.astype(jnp.int32) * sub_w)
                mask0 = subtile_mask(s0)
                mask1 = subtile_mask(s1)
                h0 = mask0 > 0
                h1 = mask1 > 0
                ent0 = entry_of(c0, mask0)
                ent1 = entry_of(c1, mask1)
                dneg = jnp.where(
                    ax == 0, dneg_x, jnp.where(ax == 1, dneg_y, dneg_z)
                )
                near_r = jnp.where(dneg, ent1, ent0)
                far_r = jnp.where(dneg, ent0, ent1)
                near_h = jnp.where(dneg, h1, h0) & inner
                far_h = jnp.where(dneg, h0, h1) & inner
                stack_ref[sp] = far_r
                sp = sp + far_h.astype(jnp.int32)
                stack_ref[sp] = near_r
                sp = sp + near_h.astype(jnp.int32)

                @pl.when(jnp.logical_not(inner))
                def _():
                    v = -ref - 1
                    blk = v >> 4
                    lmask = v & 15
                    for j in range(leaf_span):
                        k = blk * leaf_span + j

                        @pl.when(k < n_cl)
                        def _():
                            dma = pltpu.make_async_copy(
                                tris_hbm.at[
                                    :, pl.ds((tile_base + k) * TRI_TILE,
                                             TRI_TILE)
                                ],
                                tri_vmem, sem,
                            )
                            dma.start()
                            dma.wait()
                            tris = jnp.transpose(tri_vmem[:])
                            for st in range(n_sub):

                                @pl.when(((lmask >> st) & 1) > 0)
                                def _():
                                    sl = slice(st * 128, (st + 1) * 128)
                                    rb = orays[:, sl]
                                    if any_hit:
                                        hit, _, _, _ = _pairwise_mt_t(
                                            rb, tris, rb[7:8, :]
                                        )
                                        got = jnp.max(
                                            hit.astype(jnp.float32),
                                            axis=0, keepdims=True,
                                        )
                                        out_ref[0:1, sl] = jnp.maximum(
                                            out_ref[0:1, sl], got
                                        )
                                    else:
                                        out_ref[0:4, sl] = closest_update(
                                            out_ref[0:4, sl], rb, tris,
                                            prim_base + k * TRI_TILE,
                                        )

                if any_hit:
                    done = jnp.all(out_ref[0, :] > 0.0)
                return sp, done

            stack_ref[0] = jnp.int32(0)
            jax.lax.while_loop(
                cond, body, (jnp.int32(1), jnp.bool_(False))
            )

        return ()

    jax.lax.fori_loop(0, n_inst, inst_body, ())


@functools.partial(
    jax.jit, static_argnames=("any_hit", "leaf_span", "interpret")
)
def run_instanced_tree(rays, instf, insti, nodes, tris, any_hit, leaf_span,
                       interpret=False):
    """Instanced two-level tree launch. rays [8, Npad]; tris [16, sum
    Kp*128] per-prototype padded (tris on lanes); nodes = concatenated
    per-prototype build_cluster_tree tables (see _instanced_tree_kernel
    for the instance table layout)."""
    n_ray_tiles = rays.shape[1] // RAY_TILE
    kernel = functools.partial(
        _instanced_tree_kernel, n_inst=instf.shape[0], leaf_span=leaf_span,
        any_hit=any_hit,
    )
    out_rows = 1 if any_hit else 4
    return pl.pallas_call(
        kernel,
        grid=(n_ray_tiles,),
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # instance f32 table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # instance i32 table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # node table
            pl.BlockSpec(memory_space=pl.ANY),       # tris stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (out_rows, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (out_rows, rays.shape[1]), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((16, TRI_TILE), jnp.float32),
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rays, instf, insti, nodes, tris)
