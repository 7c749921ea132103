"""Gmsh debug output (.msh v2 ASCII + nodal views).

Counterpart of the reference's Gmsh debug writer
(ref: src/core/io/src/4C_io_gmsh.cpp — dumps discretizations and fields
as Gmsh post-processing views for debugging cut/contact geometry).
"""

from __future__ import annotations

import numpy as np

_GMSH_TYPE = {
    "line2": 1, "tri3": 2, "quad4": 3, "tet4": 4, "hex8": 5,
    "wedge6": 6, "pyramid5": 7, "line3": 8, "tri6": 9, "quad9": 10,
    "tet10": 11, "hex27": 12, "quad8": 16, "hex20": 17,
}


def write_msh(path, coords, blocks, point_data=None):
    """Write mesh (+ optional nodal views) as Gmsh v2 ASCII.

    blocks: {name: conn} or {name: ElementBlock}; point_data:
    {viewname: (n,) or (n, 3)}.
    """
    coords = np.asarray(coords, float)
    n = coords.shape[0]
    xyz = np.zeros((n, 3))
    xyz[:, : coords.shape[1]] = coords
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes", str(n)]
    for i, p in enumerate(xyz):
        lines.append(f"{i + 1} {p[0]:.16g} {p[1]:.16g} {p[2]:.16g}")
    lines.append("$EndNodes")
    elems = []
    eid = 1
    for key, blk in blocks.items():
        cell = getattr(blk, "cell", key)
        conn = np.asarray(getattr(blk, "conn", blk))
        t = _GMSH_TYPE[cell]
        for row in conn + 1:
            elems.append(f"{eid} {t} 2 0 0 " + " ".join(map(str, row)))
            eid += 1
    lines += ["$Elements", str(len(elems))] + elems + ["$EndElements"]

    for name, data in (point_data or {}).items():
        data = np.asarray(data, float)
        ncomp = 1 if data.ndim == 1 else 3
        vals = data.reshape(n, -1)
        if ncomp == 3 and vals.shape[1] < 3:
            vals = np.pad(vals, ((0, 0), (0, 3 - vals.shape[1])))
        lines += ["$NodeData", "1", f'"{name}"', "1", "0.0", "3", "0",
                  str(ncomp), str(n)]
        for i in range(n):
            lines.append(f"{i + 1} " + " ".join(f"{v:.16g}" for v in vals[i]))
        lines.append("$EndNodeData")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
