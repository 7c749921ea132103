"""Runtime VTU output.

Counterpart of the reference's runtime visualization
(ref: src/core/io/src/4C_io_visualization_manager.hpp, VTU-per-rank writers
4C_io_visualization_writer_vtu_per_rank.cpp; offline filter
src/post/4C_post_vtk_vtu_writer.cpp).  Writes ascii .vtu unstructured-grid
files + a .pvd time-series collection readable by ParaView.
"""

from __future__ import annotations

import base64
import os
import struct

import numpy as np

# VTK cell type ids
_VTK_TYPE = {
    "line2": 3, "line3": 21,
    "tri3": 5, "tri6": 22,
    "quad4": 9, "quad8": 23, "quad9": 28,
    "tet4": 10, "tet10": 24,
    "hex8": 12, "hex20": 25, "hex27": 29,
    "wedge6": 13, "pyramid5": 14,
}


def write_vtu(path, coords, blocks, point_data=None, cell_data=None):
    """coords: (n,dim); blocks: {cellname: conn (n_ele, nen)};
    point_data: {name: (n, c) or (n,)} arrays."""
    coords = np.asarray(coords, dtype=np.float64)
    n = coords.shape[0]
    if coords.shape[1] < 3:
        coords = np.pad(coords, ((0, 0), (0, 3 - coords.shape[1])))

    conns, offsets, types = [], [], []
    off = 0
    for cell, conn in blocks.items():
        conn = np.asarray(conn)
        for row in conn:
            conns.extend(int(v) for v in row)
            off += len(row)
            offsets.append(off)
            types.append(_VTK_TYPE[cell])

    def da(name, data, ncomp):
        flat = " ".join(f"{v:.12g}" for v in np.asarray(data, dtype=np.float64).reshape(-1))
        return (
            f'<DataArray type="Float64" Name="{name}" '
            f'NumberOfComponents="{ncomp}" format="ascii">{flat}</DataArray>'
        )

    pd = ""
    if point_data:
        parts = []
        for name, arr in point_data.items():
            arr = np.asarray(arr)
            ncomp = 1 if arr.ndim == 1 else arr.shape[1]
            parts.append(da(name, arr, ncomp))
        pd = "<PointData>" + "".join(parts) + "</PointData>"
    cd = ""
    if cell_data:
        parts = []
        for name, arr in cell_data.items():
            arr = np.asarray(arr)
            ncomp = 1 if arr.ndim == 1 else arr.shape[1]
            parts.append(da(name, arr, ncomp))
        cd = "<CellData>" + "".join(parts) + "</CellData>"

    xml = f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">
<UnstructuredGrid>
<Piece NumberOfPoints="{n}" NumberOfCells="{len(types)}">
<Points>{da('Points', coords, 3)}</Points>
<Cells>
<DataArray type="Int64" Name="connectivity" format="ascii">{' '.join(map(str, conns))}</DataArray>
<DataArray type="Int64" Name="offsets" format="ascii">{' '.join(map(str, offsets))}</DataArray>
<DataArray type="UInt8" Name="types" format="ascii">{' '.join(map(str, types))}</DataArray>
</Cells>
{pd}{cd}
</Piece>
</UnstructuredGrid>
</VTKFile>
"""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write(xml)


def write_pvd(path, entries):
    """entries: list of (time, vtu_relpath)."""
    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="Collection" version="0.1">',
        "<Collection>",
    ]
    for t, fp in entries:
        lines.append(f'<DataSet timestep="{t:.12g}" file="{fp}"/>')
    lines += ["</Collection>", "</VTKFile>"]
    with open(path, "w") as fh:
        fh.write("\n".join(lines))


class VtuWriterCallback:
    """Time-loop callback writing displacement (+ stress) per step."""

    def __init__(self, f, io_cfg, name="structure"):
        self.f = f
        self.dir = io_cfg["output_dir"]
        self.interval = io_cfg["interval"]
        self.write_stress = io_cfg.get("write_stress", False)
        self.name = name
        self.entries = []
        self._count = 0

    def __call__(self, fieldname, state, agg):
        self._count += 1
        if self._count % self.interval:
            return
        step = int(state["step"])
        fn = f"{self.name}-{step:05d}.vtu"
        path = os.path.join(self.dir, fn)
        d = np.asarray(state["d"]).reshape(-1, self.f.ndpn)
        point_data = {"displacement": d}
        if "v" in state:
            point_data["velocity"] = np.asarray(state["v"]).reshape(-1, self.f.ndpn)
        if self.write_stress:
            sig = np.asarray(self.f.nodal_stresses(state["d"], history=state["hist"] or None))
            point_data["cauchy_stress"] = sig.reshape(sig.shape[0], -1)
        blocks = {blk.cell: blk.conn for blk in self.f.disc.blocks.values()}
        write_vtu(path, self.f.disc.coords, blocks, point_data=point_data)
        self.entries.append((float(state["t"]), fn))
        write_pvd(os.path.join(self.dir, f"{self.name}.pvd"), self.entries)
