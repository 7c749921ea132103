"""Geometric search: linear BVH + matching octree (ArborX analog).

TPU-native counterpart of the reference's geometric-search module
(ref: src/core/geometric_search/src/4C_geometric_search_bvh.cpp — ArborX
BVH broad-phase collision search — and
4C_geometric_search_matchingoctree.cpp — nearest-node matching between
discretizations).  The grid hash (particles/gridhash.py) remains the hot
path for uniform point clouds; the BVH covers the ArborX use cases the
hash handles poorly: boxes of widely varying extent (beam segments vs
solid faces) and strongly non-uniform spatial density.

Design: a *linear* BVH (Karras-style) built host-side in numpy from Morton
codes — construction is a rare host event (like mesh partitioning), the
tree is a frozen set of int/float device arrays.  Queries run on device:
a vmapped stackless traversal (fixed-size explicit stack in registers,
``lax.while_loop``), returning fixed-capacity candidate lists — the same
static-shape masking discipline as the contact broad phase (SURVEY.md §7
hard parts).  No object graph, no pointer chasing off-device.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from fourc_tpu.core import native

__all__ = ["Bvh", "build_bvh", "query_aabbs", "match_nodes"]

_STACK = 64  # max traversal depth * 2; ample for < 2^31 leaves


def _expand_bits(v):
    """Spread the low 10 bits of v so consecutive bits are 3 apart."""
    v = (v * 0x00010001) & 0xFF0000FF
    v = (v * 0x00000101) & 0x0F00F00F
    v = (v * 0x00000011) & 0xC30C30C3
    v = (v * 0x00000005) & 0x49249249
    return v


def morton3(pts01: np.ndarray) -> np.ndarray:
    """30-bit Morton codes of points scaled to [0,1)^3. (N,3) -> (N,)."""
    q = np.clip((pts01 * 1024.0).astype(np.uint32), 0, 1023)
    return (_expand_bits(q[:, 0]) << 2 | _expand_bits(q[:, 1]) << 1
            | _expand_bits(q[:, 2])).astype(np.uint64)


@dataclass(frozen=True)
class Bvh:
    """Frozen LBVH over N leaf boxes.

    Internal nodes are 0..N-2, leaves are N-1..2N-2 (node id >= N-1 means
    leaf id = node - (N-1)).  ``order`` maps leaf slot -> original box id.
    """

    left: jnp.ndarray    # (N-1,) int32 child node ids
    right: jnp.ndarray   # (N-1,) int32
    lo: jnp.ndarray      # (2N-1, 3) node AABB min (internal + leaf)
    hi: jnp.ndarray      # (2N-1, 3) node AABB max
    order: jnp.ndarray   # (N,) int32 leaf -> original box id

    @property
    def n_leaves(self):
        return self.order.shape[0]


def build_bvh(box_lo, box_hi) -> Bvh:
    """Build an LBVH from N axis-aligned boxes (host-side, numpy).

    Hierarchy construction follows the radix-tree recursion over the
    sorted Morton codes of box centers (the standard Karras construction,
    done here with an explicit stack): each internal node covers a
    contiguous Morton range and splits it at the highest differing bit.
    """
    box_lo = np.asarray(box_lo, np.float64)
    box_hi = np.asarray(box_hi, np.float64)
    n = box_lo.shape[0]
    if n == 0:
        raise ValueError("empty box set")
    if n > 1:
        built = native.lbvh_build(box_lo, box_hi)
        if built is not None:
            left, right, order, lo_all, hi_all = built
            return Bvh(left=jnp.asarray(left), right=jnp.asarray(right),
                       lo=jnp.asarray(lo_all), hi=jnp.asarray(hi_all),
                       order=jnp.asarray(order))
    c = 0.5 * (box_lo + box_hi)
    span_lo, span_hi = c.min(axis=0), c.max(axis=0)
    ext = np.where(span_hi > span_lo, span_hi - span_lo, 1.0)
    codes = morton3((c - span_lo) / ext)
    order = np.argsort(codes, kind="stable").astype(np.int32)
    codes = codes[order]
    # make codes unique by appending the index (ties split arbitrarily)
    keys = (codes.astype(np.uint64) << np.uint64(32)) | np.arange(
        n, dtype=np.uint64)

    if n == 1:
        return Bvh(left=jnp.zeros((0,), jnp.int32),
                   right=jnp.zeros((0,), jnp.int32),
                   lo=jnp.asarray(box_lo, jnp.float32),
                   hi=jnp.asarray(box_hi, jnp.float32),
                   order=jnp.asarray(order))

    left = np.empty(n - 1, np.int32)
    right = np.empty(n - 1, np.int32)

    def _split(i, j):
        """Highest-differing-bit split of the sorted key range [i, j]."""
        first, last = int(keys[i]), int(keys[j])
        common = 64 - int(first ^ last).bit_length()
        lo_s, hi_s = i, j
        while lo_s + 1 < hi_s:  # last index sharing > common bits w/ first
            mid = (lo_s + hi_s) // 2
            shared = 64 - int(first ^ int(keys[mid])).bit_length()
            if shared > common:
                lo_s = mid
            else:
                hi_s = mid
        return lo_s

    # iterative top-down build; internal node ids assigned in preorder over
    # multi-leaf ranges only (a single-leaf range IS the leaf n-1+i)
    stack = [(0, n - 1)]
    ids = {}
    rng_of = []
    while stack:
        i, j = stack.pop()
        ids[(i, j)] = len(rng_of)
        rng_of.append((i, j))
        split = _split(i, j)
        if split + 1 < j:
            stack.append((split + 1, j))
        if split > i:
            stack.append((i, split))
    assert len(rng_of) == n - 1
    for nid2, (i, j) in enumerate(rng_of):
        split = _split(i, j)
        left[nid2] = (n - 1 + i) if split == i else ids[(i, split)]
        right[nid2] = (n - 1 + j) if split + 1 == j else ids[(split + 1, j)]

    # bottom-up AABBs: leaves then internal nodes in reverse preorder
    lo_all = np.empty((2 * n - 1, 3))
    hi_all = np.empty((2 * n - 1, 3))
    lo_all[n - 1:] = box_lo[order]
    hi_all[n - 1:] = box_hi[order]
    for nid2 in range(n - 2, -1, -1):
        l, r = left[nid2], right[nid2]
        lo_all[nid2] = np.minimum(lo_all[l], lo_all[r])
        hi_all[nid2] = np.maximum(hi_all[l], hi_all[r])

    return Bvh(left=jnp.asarray(left), right=jnp.asarray(right),
               lo=jnp.asarray(lo_all, jnp.float32),
               hi=jnp.asarray(hi_all, jnp.float32),
               order=jnp.asarray(order))


def query_aabbs(bvh: Bvh, q_lo, q_hi, max_hits: int):
    """Device broad phase: for each query box, ids of overlapping leaves.

    Returns (hits (Q, max_hits) int32 original box ids, -1 padded;
    counts (Q,) int32 — counts may exceed max_hits, in which case the list
    is truncated and the caller should rebuild with larger capacity: the
    fixed-capacity overflow contract of the contact broad phase).
    """
    n = bvh.n_leaves
    q_lo = jnp.asarray(q_lo, jnp.float32)
    q_hi = jnp.asarray(q_hi, jnp.float32)

    if n == 1:
        hit = jnp.all((q_lo <= bvh.hi[0]) & (q_hi >= bvh.lo[0]), axis=-1)
        ids = jnp.where(hit, bvh.order[0], -1).astype(jnp.int32)
        hits = jnp.where(jnp.arange(max_hits)[None, :] == 0,
                         ids[:, None], -1)
        return hits, hit.astype(jnp.int32)

    def one(ql, qh):
        stack = jnp.full((_STACK,), -1, jnp.int32).at[0].set(0)
        hits = jnp.full((max_hits,), -1, jnp.int32)

        def cond(s):
            _, _, top, _ = s
            return top >= 0

        def body(s):
            stack, hits, top, cnt = s
            node = stack[top]
            top = top - 1
            overlap = jnp.all((ql <= bvh.hi[node]) & (qh >= bvh.lo[node]))
            is_leaf = node >= n - 1

            # leaf hit: record (truncate at capacity)
            rec = overlap & is_leaf
            slot = jnp.minimum(cnt, max_hits - 1)
            leaf_id = bvh.order[jnp.maximum(node - (n - 1), 0)]
            hits = hits.at[slot].set(
                jnp.where(rec, leaf_id, hits[slot]))
            cnt = cnt + rec.astype(jnp.int32)

            # internal overlap: push children
            push = overlap & ~is_leaf
            node_i = jnp.minimum(node, n - 2)
            top1 = top + push.astype(jnp.int32)
            stack = stack.at[jnp.minimum(top1, _STACK - 1)].set(
                jnp.where(push, bvh.left[node_i], stack[jnp.minimum(
                    top1, _STACK - 1)]))
            top2 = top1 + push.astype(jnp.int32)
            stack = stack.at[jnp.minimum(top2, _STACK - 1)].set(
                jnp.where(push, bvh.right[node_i], stack[jnp.minimum(
                    top2, _STACK - 1)]))
            return stack, hits, top2, cnt

        _, hits, _, cnt = jax.lax.while_loop(
            cond, body, (stack, hits, jnp.asarray(0, jnp.int32),
                         jnp.asarray(0, jnp.int32)))
        return hits, cnt

    return jax.vmap(one)(q_lo, q_hi)


def match_nodes(coords_a, coords_b, tol: float = 1e-8):
    """Matching-octree analog: for each node of A, the id of the matching
    node of B (ref: 4C_geometric_search_matchingoctree.cpp — used for
    periodic BCs and matched interface coupling).

    Host-side exact matching via lexicographic sort on quantized
    coordinates; O((N+M) log) and independent of mesh numbering.
    Returns (N,) int64 with -1 where no B node lies within tol.
    """
    a = np.asarray(coords_a, np.float64)
    b = np.asarray(coords_b, np.float64)
    dim = a.shape[1]
    fast = native.match_nodes(a, b, tol)
    if fast is not None:
        return fast
    # hash B into cells of size 2*tol; check a point's cell and its 3^d
    # neighborhood so quantization-boundary jitter cannot miss a match
    cell = 2.0 * tol
    cells = {}
    for jb, q in enumerate(np.floor(b / cell).astype(np.int64)):
        cells.setdefault(tuple(q), []).append(jb)
    from itertools import product
    offsets = list(product((-1, 0, 1), repeat=dim))
    out = np.full(a.shape[0], -1, np.int64)
    qa = np.floor(a / cell).astype(np.int64)
    for ia in range(a.shape[0]):
        best, bd = -1, tol
        base = qa[ia]
        for off in offsets:
            for jb in cells.get(tuple(base + np.asarray(off)), ()):
                d = np.linalg.norm(a[ia] - b[jb])
                if d <= bd:
                    best, bd = jb, d
        out[ia] = best
    return out
