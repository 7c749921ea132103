"""Mesh partitioning + locality reordering (host-side, once per mesh).

Counterpart of the reference's Isorropia/Zoltan graph partitioning
(ref: src/core/rebalance/src/4C_rebalance_graph_based.cpp:59-110) and node
ghosting via row/col maps.  The TPU design keeps GLOBAL sharded arrays and
reorders nodes/elements so that each device's shard is a geometrically
compact subdomain: gathers then hit mostly-local shards and XLA's SPMD
partitioner turns the boundary traffic into halo collectives.

Recursive coordinate bisection (RCB) is used — deterministic, O(n log n),
and good enough for the regular meshes the benchmarks use; graph-based
partitioning can be swapped in where element connectivity is irregular.
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.core.mesh import Discretization, ElementBlock, FaceBlock


def rcb_order(points: np.ndarray, n_parts: int) -> np.ndarray:
    """Return a permutation grouping points into n_parts compact parts.

    points: (n, dim). n_parts must be a power of two (pad up otherwise).
    """
    from fourc_tpu.core import native

    nat = native.rcb_order(points, n_parts)
    if nat is not None:
        return nat
    n = points.shape[0]
    idx = np.arange(n)
    parts = [idx]
    levels = int(np.ceil(np.log2(max(n_parts, 1))))
    for _ in range(levels):
        new_parts = []
        for p in parts:
            if len(p) <= 1:
                new_parts += [p, p[:0]]
                continue
            ext = points[p].max(axis=0) - points[p].min(axis=0)
            ax = int(np.argmax(ext))
            order = p[np.argsort(points[p, ax], kind="stable")]
            half = len(order) // 2
            new_parts += [order[:half], order[half:]]
        parts = new_parts
    return np.concatenate(parts)


def graph_order(disc: Discretization, n_parts: int) -> np.ndarray:
    """Graph-based partitioning: recursive SPECTRAL bisection of the node
    connectivity graph (Fiedler vector).

    The connectivity-aware analog of the reference's Zoltan hypergraph
    partitioning (ref: 4C_rebalance_graph_based.cpp:59-110) — minimizes
    cut edges (halo traffic) instead of geometric extent, which matters for
    irregular/unstructured meshes where RCB cuts through dense regions.
    Falls back to RCB when scipy's eigensolver is unavailable or fails.
    """
    try:
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
    except Exception:  # pragma: no cover
        return rcb_order(disc.coords, n_parts)

    n = disc.n_nodes
    rows, cols = [], []
    for blk in disc.blocks.values():
        conn = np.asarray(blk.conn)
        nen = conn.shape[1]
        for a in range(nen):
            for b in range(a + 1, nen):
                rows.append(conn[:, a])
                cols.append(conn[:, b])
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    A = sp.coo_matrix((np.ones(r.size), (r, c)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64).tocsr()

    def bisect(idx):
        if len(idx) <= 1:
            return idx, idx[:0]
        Asub = A[idx][:, idx]
        deg = np.asarray(Asub.sum(axis=1)).ravel()
        L = sp.diags(deg) - Asub
        def cut_of(vec):
            order = np.argsort(vec, kind="stable")
            half = len(order) // 2
            inA = np.zeros(len(idx), bool)
            inA[order[:half]] = True
            # edges crossing the bisection
            coo = Asub.tocoo()
            return int(np.sum(inA[coo.row] != inA[coo.col]))

        try:
            if len(idx) <= 3000:  # dense: deterministic, exact Fiedler
                vals, vecs = np.linalg.eigh(L.toarray())
                # symmetric meshes have a DEGENERATE lambda_2 eigenspace
                # (e.g. x/y/z of a cube): pick the basis vector with the
                # smallest actual cut
                lam2 = vals[1]
                cands = [k for k in range(1, min(len(vals), 6))
                         if vals[k] <= lam2 * (1 + 1e-8) + 1e-12]
                fiedler = min((vecs[:, k] for k in cands), key=cut_of)
            else:
                v0 = np.linspace(-1.0, 1.0, len(idx))  # deterministic start
                vals, vecs = spla.eigsh(L, k=2, sigma=-1e-6, which="LM",
                                        v0=v0)
                fiedler = vecs[:, np.argsort(vals)[1]]
        except Exception:
            # fallback: coordinate split of this subset
            ext = disc.coords[idx].max(0) - disc.coords[idx].min(0)
            fiedler = disc.coords[idx, int(np.argmax(ext))]
        order = idx[np.argsort(fiedler, kind="stable")]
        half = len(order) // 2
        return order[:half], order[half:]

    parts = [np.arange(n)]
    levels = int(np.ceil(np.log2(max(n_parts, 1))))
    for _ in range(levels):
        nxt = []
        for p in parts:
            a, b = bisect(p)
            nxt += [a, b]
        parts = nxt
    return np.concatenate(parts)


def edge_cut(disc: Discretization, perm_old2new: np.ndarray,
             n_parts: int) -> int:
    """Count element-internal node pairs split across parts (halo metric)."""
    counts = partition_counts(disc.n_nodes, n_parts)
    bounds = np.cumsum(counts)
    part_of = np.searchsorted(bounds, perm_old2new, side="right")
    cut = 0
    for blk in disc.blocks.values():
        p = part_of[np.asarray(blk.conn)]
        cut += int(np.sum(p.max(axis=1) != p.min(axis=1)))
    return cut


def partition_counts(n: int, n_parts: int) -> np.ndarray:
    """Balanced contiguous shard sizes (XLA-style: equal blocks, last ragged)."""
    base = n // n_parts
    rem = n % n_parts
    return np.array([base + (1 if i < rem else 0) for i in range(n_parts)])


def reorder_for_devices(disc: Discretization, n_devices: int,
                        method: str = "rcb") -> tuple[Discretization, np.ndarray]:
    """Renumber nodes + elements for device locality.

    method: "rcb" (geometric) or "graph" (spectral bisection).
    Returns (new_disc, node_perm) with node_perm mapping old->new ids.
    Elements are sorted by the partition of their first node so contiguous
    element shards touch contiguous node shards.
    """
    if method == "graph":
        perm = graph_order(disc, n_devices)
    else:
        perm = rcb_order(disc.coords, n_devices)  # new order: perm[i] = old id
    old2new = np.empty(disc.n_nodes, dtype=np.int32)
    old2new[perm] = np.arange(disc.n_nodes, dtype=np.int32)

    new = Discretization(name=disc.name, coords=disc.coords[perm])
    for key, blk in disc.blocks.items():
        conn = old2new[blk.conn]
        centroid_part = conn.min(axis=1)  # cheap locality key
        eorder = np.argsort(centroid_part, kind="stable")
        new.blocks[key] = ElementBlock(blk.cell, conn[eorder], blk.mat_id[eorder])
    for nm, ids in disc.node_sets.items():
        new.node_sets[nm] = np.sort(old2new[ids])
    for nm, fbs in disc.face_sets.items():
        new.face_sets[nm] = [FaceBlock(fb.cell, old2new[fb.conn]) for fb in fbs]
    if hasattr(disc, "structured_shape"):
        # structured provenance is invalidated by reordering; keep original
        # ordering info for multigrid via the permutation
        new.structured_shape = disc.structured_shape
        new.node_perm = old2new
    return new, old2new


def pad_for_devices(disc: Discretization, n_devices: int) -> Discretization:
    """Pad node/element counts to multiples of n_devices.

    JAX shardings need evenly divisible leading axes.  Padding elements are
    geometric copies of each block's first element translated far outside
    the domain and wired to dedicated dummy nodes; dummy nodes are collected
    in node set ``__padding__`` which the fields constrain to zero, so the
    padding contributes nothing to the masked residual/tangent (the analog
    of inactive ghost rows in the reference's Epetra col maps).
    """
    import copy

    if n_devices <= 1:
        return disc
    coords = disc.coords
    extra_coords = []
    far = coords.max(axis=0) + 10.0 * (coords.max(axis=0) - coords.min(axis=0) + 1.0)
    new_blocks = {}
    next_node = disc.n_nodes
    for key, blk in disc.blocks.items():
        n_ele = blk.n_ele
        n_pad = (-n_ele) % n_devices
        if n_pad == 0:
            new_blocks[key] = blk
            continue
        nen = blk.conn.shape[1]
        # dummy nodes replicate element 0's geometry, translated
        base_ids = blk.conn[0]
        dummy_ids = np.arange(next_node, next_node + nen, dtype=np.int32)
        next_node += nen
        extra_coords.append(coords[base_ids] + far[None, :])
        pad_conn = np.tile(dummy_ids[None, :], (n_pad, 1))
        pad_mat = np.full(n_pad, blk.mat_id[0], dtype=np.int32)
        new_blocks[key] = ElementBlock(
            blk.cell,
            np.concatenate([blk.conn, pad_conn], axis=0),
            np.concatenate([blk.mat_id, pad_mat]),
        )
    # pad node count to a multiple of n_devices (isolated far-away points)
    total_nodes = next_node
    n_node_pad = (-total_nodes) % n_devices
    if n_node_pad:
        extra_coords.append(
            far[None, :] + np.arange(1, n_node_pad + 1)[:, None] * 0.01
        )
        total_nodes += n_node_pad
    if total_nodes == disc.n_nodes:
        return disc

    new = Discretization(
        name=disc.name,
        coords=np.concatenate([coords] + extra_coords, axis=0)
        if extra_coords
        else coords,
        blocks=new_blocks,
        node_sets=dict(disc.node_sets),
        face_sets=dict(disc.face_sets),
    )
    new.node_sets["__padding__"] = np.arange(
        disc.n_nodes, total_nodes, dtype=np.int32
    )
    for attr in ("structured_shape", "node_perm"):
        if hasattr(disc, attr):
            setattr(new, attr, getattr(disc, attr))
    return new
