"""Internal structured grid generator.

Counterpart of the reference's
``Core::IO::GridGenerator::create_rectangular_cuboid_discretization``
(ref: src/core/io/src/4C_io_gridgenerator.hpp:35).  Generates hex8 / hex27 /
tet4 / wedge6 boxes in 3D and quad4 / tri3 rectangles in 2D, with canonical
node sets (``xmin``/``xmax``/... faces, edges and corners) and face sets for
surface Neumann conditions.  Structured provenance is kept (``shape``,
per-node ijk) so the geometric-multigrid preconditioner can build coarse
levels for free.
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.core.mesh import Discretization, ElementBlock, FaceBlock


def _hex_grid_nodes(nx, ny, nz, lo, hi, order=1):
    """Nodes of an (order*n+1)^3 lattice; returns coords and ijk->id."""
    px, py, pz = order * nx + 1, order * ny + 1, order * nz + 1
    xs = np.linspace(lo[0], hi[0], px)
    ys = np.linspace(lo[1], hi[1], py)
    zs = np.linspace(lo[2], hi[2], pz)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    def nid(i, j, k):
        return (i * py + j) * pz + k

    return coords, nid, (px, py, pz)


_HEX8_LOCAL = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0), (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]

# hex27 local offsets in reference order (corners, 12 edge mids, 6 face centres, centre)
_HEX27_LOCAL = (
    [(0, 0, 0), (2, 0, 0), (2, 2, 0), (0, 2, 0), (0, 0, 2), (2, 0, 2), (2, 2, 2), (0, 2, 2)]
    + [(1, 0, 0), (2, 1, 0), (1, 2, 0), (0, 1, 0), (0, 0, 1), (2, 0, 1), (2, 2, 1), (0, 2, 1),
       (1, 0, 2), (2, 1, 2), (1, 2, 2), (0, 1, 2)]
    + [(1, 1, 0), (1, 0, 1), (2, 1, 1), (1, 2, 1), (0, 1, 1), (1, 1, 2)]
    + [(1, 1, 1)]
)

# each hex split into 6 tets (consistent orientation, no new nodes)
_HEX_TO_TETS = [
    (0, 1, 2, 6),
    (0, 2, 3, 6),
    (0, 3, 7, 6),
    (0, 7, 4, 6),
    (0, 4, 5, 6),
    (0, 5, 1, 6),
]


def box(
    nx: int,
    ny: int,
    nz: int,
    lo=(0.0, 0.0, 0.0),
    hi=(1.0, 1.0, 1.0),
    cell: str = "hex8",
    name: str = "structure",
    mat_id: int = 1,
) -> Discretization:
    """nx×ny×nz-element rectangular cuboid."""
    order = 2 if cell in ("hex27", "hex20") else 1

    conns = None
    if order == 1:
        from fourc_tpu.core import native

        nat = native.hex_box(nx, ny, nz, lo, hi)
        if nat is not None:
            coords, conns = nat
    if conns is None:
        coords, nid, shape = _hex_grid_nodes(nx, ny, nz, lo, hi, order)
        cl = []
        for i in range(nx):
            for j in range(ny):
                for k in range(nz):
                    if cell in ("hex8", "tet4", "wedge6"):
                        c = [nid(i + di, j + dj, k + dk) for di, dj, dk in _HEX8_LOCAL]
                    else:  # quadratic
                        c = [nid(2 * i + di, 2 * j + dj, 2 * k + dk)
                             for di, dj, dk in _HEX27_LOCAL]
                    cl.append(c)
        conns = np.asarray(cl, dtype=np.int32)

    disc = Discretization(name=name, coords=coords)
    if cell == "hex8":
        disc.blocks["hex8"] = ElementBlock("hex8", conns, mat_id)
    elif cell == "hex27":
        disc.blocks["hex27"] = ElementBlock("hex27", conns, mat_id)
    elif cell == "hex20":
        # drop face centres + centre from hex27 numbering, then compact node ids
        conn20 = conns[:, :20]
        used = np.unique(conn20)
        remap = -np.ones(coords.shape[0], dtype=np.int32)
        remap[used] = np.arange(used.size, dtype=np.int32)
        disc = Discretization(name=name, coords=coords[used])
        disc.blocks["hex20"] = ElementBlock("hex20", remap[conn20], mat_id)
        _add_box_sets(disc, lo, hi)
        return disc
    elif cell == "tet4":
        tets = np.concatenate([conns[:, t] for t in _HEX_TO_TETS], axis=0)
        disc.blocks["tet4"] = ElementBlock("tet4", tets, mat_id)
    elif cell == "wedge6":
        w1 = conns[:, [0, 1, 2, 4, 5, 6]]
        w2 = conns[:, [0, 2, 3, 4, 6, 7]]
        disc.blocks["wedge6"] = ElementBlock("wedge6", np.concatenate([w1, w2], axis=0), mat_id)
    else:
        raise ValueError(f"unsupported 3D cell {cell!r}")

    disc.structured_shape = (nx, ny, nz, order)  # multigrid provenance
    _add_box_sets(disc, lo, hi)
    return disc


def line(n: int, p0=(0.0, 0.0, 0.0), p1=(1.0, 0.0, 0.0), name: str = "structure",
         mat_id: int = 1) -> Discretization:
    """n line2 elements from p0 to p1 (beam/truss meshes)."""
    p0 = np.asarray(p0, float)
    p1 = np.asarray(p1, float)
    ts = np.linspace(0.0, 1.0, n + 1)[:, None]
    coords = p0[None, :] + ts * (p1 - p0)[None, :]
    conn = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1).astype(np.int32)
    disc = Discretization(name=name, coords=coords)
    disc.blocks["line2"] = ElementBlock("line2", conn, mat_id)
    disc.node_sets["start"] = np.array([0], np.int32)
    disc.node_sets["end"] = np.array([n], np.int32)
    disc.node_sets["all"] = np.arange(n + 1, dtype=np.int32)
    return disc


def rectangle(
    nx: int,
    ny: int,
    lo=(0.0, 0.0),
    hi=(1.0, 1.0),
    cell: str = "quad4",
    name: str = "structure",
    mat_id: int = 1,
) -> Discretization:
    order = 2 if cell in ("quad8", "quad9", "tri6") else 1
    px, py = order * nx + 1, order * ny + 1
    xs = np.linspace(lo[0], hi[0], px)
    ys = np.linspace(lo[1], hi[1], py)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel()], axis=1)

    def nid(i, j):
        return i * py + j

    conns = []
    for i in range(nx):
        for j in range(ny):
            if order == 1:
                conns.append([nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)])
            else:
                conns.append(
                    [
                        nid(2 * i, 2 * j),
                        nid(2 * i + 2, 2 * j),
                        nid(2 * i + 2, 2 * j + 2),
                        nid(2 * i, 2 * j + 2),
                        nid(2 * i + 1, 2 * j),
                        nid(2 * i + 2, 2 * j + 1),
                        nid(2 * i + 1, 2 * j + 2),
                        nid(2 * i, 2 * j + 1),
                        nid(2 * i + 1, 2 * j + 1),
                    ]
                )
    conns = np.asarray(conns, dtype=np.int32)

    disc = Discretization(name=name, coords=coords)
    if cell == "quad4":
        disc.blocks["quad4"] = ElementBlock("quad4", conns, mat_id)
    elif cell == "quad9":
        disc.blocks["quad9"] = ElementBlock("quad9", conns, mat_id)
    elif cell == "quad8":
        disc.blocks["quad8"] = ElementBlock("quad8", conns[:, :8], mat_id)
    elif cell == "tri3":
        t1 = conns[:, [0, 1, 2]]
        t2 = conns[:, [0, 2, 3]]
        disc.blocks["tri3"] = ElementBlock("tri3", np.concatenate([t1, t2], axis=0), mat_id)
    else:
        raise ValueError(f"unsupported 2D cell {cell!r}")

    disc.structured_shape = (nx, ny, order)
    _add_box_sets_2d(disc, lo, hi)
    return disc


def _face_quads(nodes_on_face, coords, axes):
    """Build quad4 face connectivity for a structured lattice face."""
    a, b = axes
    key = coords[nodes_on_face][:, [a, b]]
    ua = np.unique(np.round(key[:, 0], 12))
    ub = np.unique(np.round(key[:, 1], 12))
    ia = np.searchsorted(ua, np.round(key[:, 0], 12))
    ib = np.searchsorted(ub, np.round(key[:, 1], 12))
    grid = -np.ones((ua.size, ub.size), dtype=np.int64)
    grid[ia, ib] = nodes_on_face
    faces = []
    for i in range(ua.size - 1):
        for j in range(ub.size - 1):
            q = [grid[i, j], grid[i + 1, j], grid[i + 1, j + 1], grid[i, j + 1]]
            if all(v >= 0 for v in q):
                faces.append(q)
    return np.asarray(faces, dtype=np.int32)


def _add_box_sets(disc: Discretization, lo, hi):
    c = disc.coords
    tol = 1e-9 * max(1.0, float(np.abs(c).max()))
    for d, nm_lo, nm_hi in [(0, "xmin", "xmax"), (1, "ymin", "ymax"), (2, "zmin", "zmax")]:
        lo_ids = np.where(np.abs(c[:, d] - lo[d]) < tol)[0].astype(np.int32)
        hi_ids = np.where(np.abs(c[:, d] - hi[d]) < tol)[0].astype(np.int32)
        disc.node_sets[nm_lo] = lo_ids
        disc.node_sets[nm_hi] = hi_ids
        axes = tuple(a for a in range(3) if a != d)
        disc.face_sets[nm_lo] = [FaceBlock("quad4", _face_quads(lo_ids, c, axes))]
        disc.face_sets[nm_hi] = [FaceBlock("quad4", _face_quads(hi_ids, c, axes))]
    disc.node_sets["all"] = np.arange(disc.n_nodes, dtype=np.int32)


def _add_box_sets_2d(disc: Discretization, lo, hi):
    c = disc.coords
    tol = 1e-9 * max(1.0, float(np.abs(c).max()))
    for d, nm_lo, nm_hi in [(0, "xmin", "xmax"), (1, "ymin", "ymax")]:
        lo_ids = np.where(np.abs(c[:, d] - lo[d]) < tol)[0].astype(np.int32)
        hi_ids = np.where(np.abs(c[:, d] - hi[d]) < tol)[0].astype(np.int32)
        disc.node_sets[nm_lo] = lo_ids
        disc.node_sets[nm_hi] = hi_ids
        for nm, ids in [(nm_lo, lo_ids), (nm_hi, hi_ids)]:
            other = 1 - d
            order = np.argsort(c[ids, other])
            ids_sorted = ids[order]
            lines = np.stack([ids_sorted[:-1], ids_sorted[1:]], axis=1).astype(np.int32)
            disc.face_sets[nm] = [FaceBlock("line2", lines)]
    disc.node_sets["all"] = np.arange(disc.n_nodes, dtype=np.int32)


def sheet(
    nx: int,
    ny: int,
    origin=(0.0, 0.0, 0.0),
    u=(1.0, 0.0, 0.0),
    v=(0.0, 1.0, 0.0),
    cell: str = "quad4",
    name: str = "structure",
    mat_id: int = 1,
) -> Discretization:
    """Flat membrane/shell sheet embedded in 3D: origin + s*u + t*v,
    (s, t) in [0, 1]^2.  Node/edge sets named like the 2D rectangle
    (xmin/xmax = u-direction extremes, ymin/ymax = v-direction)."""
    d2 = rectangle(nx, ny, lo=(0.0, 0.0), hi=(1.0, 1.0), cell=cell,
                   name=name, mat_id=mat_id)
    st = d2.coords  # (n, 2) in unit square
    o = np.asarray(origin, float)
    uu = np.asarray(u, float)
    vv = np.asarray(v, float)
    coords3 = o[None, :] + st[:, :1] * uu[None, :] + st[:, 1:2] * vv[None, :]
    d3 = Discretization(name=name, coords=coords3, blocks=d2.blocks,
                        node_sets=d2.node_sets, face_sets=d2.face_sets)
    d3.structured_shape = None
    return d3


def merge(a: Discretization, b: Discretization, name=None) -> Discretization:
    """Merge two meshes into one multi-body Discretization (node ids of
    ``b`` offset past ``a``).  Element blocks keep per-mesh keys
    ``<cell>`` / ``<cell>@2`` (blocks must stay material-homogeneous);
    node/face sets get ``a_`` / ``b_`` prefixes.  The merged mesh is
    unstructured (no lattice/structured fast paths).  Used for contact
    problems between separate bodies (ref: multi-body input decks with
    contact conditions)."""
    off = a.n_nodes
    d = Discretization(
        name=name or a.name,
        coords=np.concatenate([np.asarray(a.coords), np.asarray(b.coords)]),
    )
    for key, blk in a.blocks.items():
        d.blocks[key] = blk
    for key, blk in b.blocks.items():
        k2 = key if key not in d.blocks else key + "@2"
        d.blocks[k2] = ElementBlock(blk.cell, np.asarray(blk.conn) + off,
                                    blk.mat_id)
    for nm, ids in a.node_sets.items():
        d.node_sets["a_" + nm] = np.asarray(ids)
    for nm, ids in b.node_sets.items():
        d.node_sets["b_" + nm] = np.asarray(ids) + off
    for nm, fbs in a.face_sets.items():
        d.face_sets["a_" + nm] = list(fbs)
    for nm, fbs in b.face_sets.items():
        d.face_sets["b_" + nm] = [
            FaceBlock(fb.cell, np.asarray(fb.conn) + off) for fb in fbs]
    d.node_sets["all"] = np.arange(d.n_nodes, dtype=np.int32)
    return d
