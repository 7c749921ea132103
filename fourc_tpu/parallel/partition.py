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


def partition_counts(n: int, n_parts: int) -> np.ndarray:
    """Balanced contiguous shard sizes (XLA-style: equal blocks, last ragged)."""
    base = n // n_parts
    rem = n % n_parts
    return np.array([base + (1 if i < rem else 0) for i in range(n_parts)])


def reorder_for_devices(disc: Discretization, n_devices: int) -> tuple[Discretization, np.ndarray]:
    """Renumber nodes + elements for device locality.

    Returns (new_disc, node_perm) with node_perm mapping old->new ids.
    Elements are sorted by the partition of their first node so contiguous
    element shards touch contiguous node shards.
    """
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
