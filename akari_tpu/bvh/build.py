"""Host-side BVH construction (NumPy), producing threaded flat arrays.

Capability parity with the reference's binned-SAH builder
(ref: src/akari/kernel/bvh-accelerator.h:151-223 — 32-bucket SAH object
splits; the SBVH spatial-split path at :224-305 is a quality refinement,
planned; the reference's std::async parallel recursion at :459-467 maps to
the optional C++ builder in akari_tpu/native/).

Layout redesign for TPU (see scene/arrays.py BVHArrays): nodes are emitted
in DFS preorder and threaded with skip links, so device traversal is a
stackless branchless while-loop — per-ray state is one node pointer instead
of the reference's 64-entry stack (bvh-accelerator.h:31 StackDepth).

Leaves hold at most MAX_LEAF primitives so the device leaf test is a fixed
unrolled gather (no dynamic trip counts under jit).
"""

from __future__ import annotations

import sys

import numpy as np

MAX_LEAF = 4
N_BINS = 16
TRAVERSAL_COST = 1.0
INTERSECT_COST = 1.0


def _build_native(p0, p1, p2):
    """C++ builder path (akari_tpu/native/bvh_builder.cpp). None on failure."""
    import ctypes

    from ..native.loader import get_bvh_lib

    lib = get_bvh_lib()
    if lib is None:
        return None
    p0 = np.ascontiguousarray(p0, dtype=np.float32)
    p1 = np.ascontiguousarray(p1, dtype=np.float32)
    p2 = np.ascontiguousarray(p2, dtype=np.float32)
    t = p0.shape[0]
    max_nodes = 2 * t + 8
    node_lo = np.empty((max_nodes, 3), np.float32)
    node_hi = np.empty((max_nodes, 3), np.float32)
    first = np.empty(max_nodes, np.int32)
    count = np.empty(max_nodes, np.int32)
    miss = np.empty(max_nodes, np.int32)
    order = np.empty(t, np.int32)
    n_nodes = ctypes.c_int64(0)

    def ptr(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    rc = lib.akr_bvh_build(
        ptr(p0, ctypes.c_float), ptr(p1, ctypes.c_float), ptr(p2, ctypes.c_float),
        ctypes.c_int64(t), ctypes.c_int(MAX_LEAF),
        ptr(node_lo, ctypes.c_float), ptr(node_hi, ctypes.c_float),
        ptr(first, ctypes.c_int32), ptr(count, ctypes.c_int32),
        ptr(miss, ctypes.c_int32), ptr(order, ctypes.c_int32),
        ctypes.c_int64(max_nodes), ctypes.byref(n_nodes),
    )
    if rc != 0:
        return None
    m = n_nodes.value
    bvh = dict(
        node_lo=node_lo[:m].copy(),
        node_hi=node_hi[:m].copy(),
        first=first[:m].copy(),
        count=count[:m].copy(),
        miss=miss[:m].copy(),
    )
    return bvh, order.astype(np.int64)


class _Node:
    __slots__ = ("lo", "hi", "start", "end", "left", "right", "_size")

    def __init__(self, lo, hi, start, end):
        self.lo, self.hi = lo, hi
        self.start, self.end = start, end
        self.left = self.right = None


def _build_recursive(tri_lo, tri_hi, centroids, order, start, end, force_leaf_depth=64):
    lo = tri_lo[order[start:end]].min(axis=0)
    hi = tri_hi[order[start:end]].max(axis=0)
    node = _Node(lo, hi, start, end)
    n = end - start
    if n <= 2:
        return node

    c = centroids[order[start:end]]
    cmin, cmax = c.min(axis=0), c.max(axis=0)
    extent = cmax - cmin
    axis = int(np.argmax(extent))

    do_median = extent[axis] <= 1e-12
    split_point = None
    if not do_median:
        # Binned SAH along the widest centroid axis.
        t = (c[:, axis] - cmin[axis]) / extent[axis]
        bins = np.minimum((t * N_BINS).astype(np.int32), N_BINS - 1)
        counts = np.bincount(bins, minlength=N_BINS)
        bin_lo = np.full((N_BINS, 3), np.inf, dtype=np.float64)
        bin_hi = np.full((N_BINS, 3), -np.inf, dtype=np.float64)
        seg_lo = tri_lo[order[start:end]]
        seg_hi = tri_hi[order[start:end]]
        np.minimum.at(bin_lo, bins, seg_lo)
        np.maximum.at(bin_hi, bins, seg_hi)

        def sa(lo_, hi_):
            d = np.maximum(hi_ - lo_, 0.0)
            return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])

        # prefix (left) / suffix (right) accumulated bounds & counts
        pre_lo = np.minimum.accumulate(bin_lo, axis=0)
        pre_hi = np.maximum.accumulate(bin_hi, axis=0)
        suf_lo = np.minimum.accumulate(bin_lo[::-1], axis=0)[::-1]
        suf_hi = np.maximum.accumulate(bin_hi[::-1], axis=0)[::-1]
        pre_n = np.cumsum(counts)
        suf_n = np.cumsum(counts[::-1])[::-1]
        # split after bin k: left bins [0..k], right bins [k+1..]
        costs = np.full(N_BINS - 1, np.inf)
        for k in range(N_BINS - 1):
            nl, nr = pre_n[k], suf_n[k + 1]
            if nl == 0 or nr == 0:
                continue
            costs[k] = nl * sa(pre_lo[k], pre_hi[k]) + nr * sa(suf_lo[k + 1], suf_hi[k + 1])
        if not np.isfinite(costs).any():
            do_median = True
        else:
            k = int(np.argmin(costs))
            leaf_cost = n * INTERSECT_COST * sa(lo, hi)
            split_cost = TRAVERSAL_COST * sa(lo, hi) + costs[k] * INTERSECT_COST
            if n <= MAX_LEAF and split_cost >= leaf_cost:
                return node
            go_left = bins <= k
            split_point = start + int(go_left.sum())
            seg = order[start:end]
            order[start:end] = np.concatenate([seg[go_left], seg[~go_left]])

    if do_median:
        # Degenerate centroids: equal split to bound leaf size.
        seg = order[start:end]
        key = centroids[seg][:, axis]
        order[start:end] = seg[np.argsort(key, kind="stable")]
        split_point = start + n // 2

    if split_point == start or split_point == end:
        split_point = start + n // 2

    node.left = _build_recursive(tri_lo, tri_hi, centroids, order, start, split_point)
    node.right = _build_recursive(tri_lo, tri_hi, centroids, order, split_point, end)
    return node


def _flatten(root):
    """Preorder DFS emit with threaded miss links; hit link is implicit +1.

    Iterative preorder with an explicit (node, miss) stack; a left child's
    subtree misses to its right sibling, whose index is idx+1+size(left).
    """
    nodes = []
    stack = [(root, -1)]
    while stack:
        node, miss = stack.pop()
        idx = len(nodes)
        is_leaf = node.left is None
        count = (node.end - node.start) if is_leaf else 0
        nodes.append((node.lo, node.hi, node.start if is_leaf else 0, count, miss))
        if not is_leaf:
            # Emit left next (hit link = idx+1). We need the right child's
            # future index for the left subtree's miss link: it equals
            # idx + 1 + size(left subtree). Compute subtree sizes lazily.
            right_idx = idx + 1 + _subtree_size(node.left)
            stack.append((node.right, miss))
            stack.append((node.left, right_idx))
    lo = np.stack([n[0] for n in nodes]).astype(np.float32)
    hi = np.stack([n[1] for n in nodes]).astype(np.float32)
    first = np.asarray([n[2] for n in nodes], dtype=np.int32)
    count = np.asarray([n[3] for n in nodes], dtype=np.int32)
    miss = np.asarray([n[4] for n in nodes], dtype=np.int32)
    return lo, hi, first, count, miss


def _subtree_size(node):
    if not hasattr(node, "_size"):
        size = 1
        if node.left is not None:
            size += _subtree_size(node.left) + _subtree_size(node.right)
        node._size = size
    return node._size


def build_bvh(p0, p1, p2, use_native=None):
    """Build a threaded BVH over triangles given [T,3] vertex arrays.

    Returns (bvh_dict, order) where ``order`` is the permutation applied to
    triangles (new_i = order[i] indexes the original arrays) and bvh_dict has
    the BVHArrays fields as numpy arrays.

    ``use_native``: None = auto (C++ builder for big scenes when the
    toolchain is available, ref-parity with the reference's native builder);
    True/False forces.
    """
    n = np.asarray(p0).shape[0]
    if use_native is None:
        use_native = n >= 20_000
    if use_native:
        out = _build_native(p0, p1, p2)
        if out is not None:
            return out
    p0 = np.asarray(p0, dtype=np.float64)
    p1 = np.asarray(p1, dtype=np.float64)
    p2 = np.asarray(p2, dtype=np.float64)
    t = p0.shape[0]
    tri_lo = np.minimum(np.minimum(p0, p1), p2)
    tri_hi = np.maximum(np.maximum(p0, p1), p2)
    centroids = (tri_lo + tri_hi) * 0.5
    order = np.arange(t)

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        root = _build_recursive(tri_lo, tri_hi, centroids, order, 0, t)
        _split_fat_leaves(root, tri_lo, tri_hi, centroids, order)
        lo, hi, first, count, miss = _flatten(root)
    finally:
        sys.setrecursionlimit(old_limit)

    # Pad the AABBs slightly for watertightness under f32 traversal.
    eps = np.float32(1e-6) * np.maximum(1.0, np.abs(lo) + np.abs(hi)).astype(np.float32)
    bvh = dict(
        node_lo=lo - eps,
        node_hi=hi + eps,
        first=first,
        count=count,
        miss=miss,
    )
    return bvh, order


def _split_fat_leaves(node, tri_lo, tri_hi, centroids, order):
    """Guarantee leaf count <= MAX_LEAF by median-splitting oversized leaves."""
    if node.left is not None:
        _split_fat_leaves(node.left, tri_lo, tri_hi, centroids, order)
        _split_fat_leaves(node.right, tri_lo, tri_hi, centroids, order)
        return
    n = node.end - node.start
    if n <= MAX_LEAF:
        return
    seg = order[node.start:node.end]
    c = centroids[seg]
    axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
    order[node.start:node.end] = seg[np.argsort(c[:, axis], kind="stable")]
    mid = node.start + n // 2

    def make(start, end):
        sub = order[start:end]
        child = _Node(
            tri_lo[sub].min(axis=0), tri_hi[sub].max(axis=0), start, end
        )
        return child

    node.left = make(node.start, mid)
    node.right = make(mid, node.end)
    _split_fat_leaves(node.left, tri_lo, tri_hi, centroids, order)
    _split_fat_leaves(node.right, tri_lo, tri_hi, centroids, order)
