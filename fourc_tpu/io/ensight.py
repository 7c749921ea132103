"""Ensight Gold output (case + geometry + per-step variable files).

Counterpart of the reference's Ensight writer
(ref: src/post/4C_post_ensight_writer.* — the post_processor's default
format; case file + 'C Binary' geometry/variable parts).

ASCII Ensight Gold is written here (self-describing, diff-able in tests);
one geometry file (static mesh) + one file per variable per step + a
.case index with the time set — the same file layout the reference's
post_ensight produces.
"""

from __future__ import annotations

import os

import numpy as np

_CELL_ENSIGHT = {
    "hex8": ("hexa8", 8), "hex20": ("hexa20", 20), "hex27": ("hexa8", 8),
    "tet4": ("tetra4", 4), "tet10": ("tetra10", 10),
    "quad4": ("quad4", 4), "quad8": ("quad8", 8), "quad9": ("quad4", 4),
    "tri3": ("tria3", 3), "tri6": ("tria6", 6),
    "wedge6": ("penta6", 6), "pyramid5": ("pyramid5", 5),
    "line2": ("bar2", 2), "line3": ("bar3", 3),
}


def _write_geometry(path, coords, blocks):
    coords = np.asarray(coords, float)
    n = coords.shape[0]
    xyz = np.zeros((n, 3))
    xyz[:, : coords.shape[1]] = coords
    with open(path, "w") as f:
        f.write("fourc_tpu Ensight Gold geometry\nmesh\n")
        f.write("node id assign\nelement id assign\n")
        f.write("part\n%10d\nvolume mesh\ncoordinates\n%10d\n" % (1, n))
        for d in range(3):
            for v in xyz[:, d]:
                f.write("%12.5e\n" % v)
        for key, blk in blocks.items():
            cell = blk.cell if hasattr(blk, "cell") else key
            ename, nen = _CELL_ENSIGHT[cell]
            conn = np.asarray(blk.conn)[:, :nen]
            f.write("%s\n%10d\n" % (ename, conn.shape[0]))
            for row in conn + 1:  # 1-based
                f.write("".join("%10d" % c for c in row) + "\n")


def _write_variable(path, name, data, n_nodes):
    data = np.asarray(data, float)
    with open(path, "w") as f:
        f.write("%s\npart\n%10d\ncoordinates\n" % (name, 1))
        if data.ndim == 1:
            for v in data:
                f.write("%12.5e\n" % v)
        else:  # vector: all x, all y, all z
            vec = np.zeros((n_nodes, 3))
            vec[:, : data.shape[1]] = data
            for d in range(3):
                for v in vec[:, d]:
                    f.write("%12.5e\n" % v)


class EnsightWriter:
    """Accumulates steps, writes <prefix>.case + geo + variable files."""

    def __init__(self, outdir, prefix, coords, blocks):
        self.dir = outdir
        os.makedirs(outdir, exist_ok=True)
        self.prefix = prefix
        self.n_nodes = np.asarray(coords).shape[0]
        self.times = []
        self.vars = {}  # name -> ("scalar"|"vector", [filenames])
        _write_geometry(os.path.join(outdir, prefix + ".geo"), coords, blocks)

    def write_step(self, t, point_data):
        """point_data: {name: (n,) scalar or (n, d) vector}."""
        k = len(self.times)
        self.times.append(float(t))
        for name, data in point_data.items():
            data = np.asarray(data)
            kind = "scalar" if data.ndim == 1 else "vector"
            fn = f"{self.prefix}.{name}.{k:04d}"
            _write_variable(os.path.join(self.dir, fn), name, data,
                            self.n_nodes)
            self.vars.setdefault(name, (kind, []))[1].append(fn)
        self._write_case()

    def _write_case(self):
        lines = ["FORMAT", "type: ensight gold", "", "GEOMETRY",
                 f"model: {self.prefix}.geo", "", "VARIABLE"]
        for name, (kind, files) in self.vars.items():
            pat = f"{self.prefix}.{name}.****"
            lines.append(f"{kind} per node: 1 {name} {pat}")
        lines += ["", "TIME", "time set: 1",
                  f"number of steps: {len(self.times)}",
                  "filename start number: 0", "filename increment: 1",
                  "time values:"]
        lines += [f"{t:.8e}" for t in self.times]
        with open(os.path.join(self.dir, self.prefix + ".case"), "w") as f:
            f.write("\n".join(lines) + "\n")


class EnsightWriterCallback:
    """Driver callback mirroring VtuWriterCallback (io/vtu.py)."""

    def __init__(self, f, io_cfg, name="structure"):
        outdir = io_cfg.get("output_dir", ".")
        self.f = f
        self.writer = EnsightWriter(outdir, name, f.disc.coords,
                                    f.disc.blocks)
        self.interval = int(io_cfg.get("interval", 1) or 1)
        self._count = 0

    def __call__(self, fieldname, state, agg):
        self._count += 1
        if self._count % self.interval:
            return
        d = np.asarray(state["d"]).reshape(-1, self.f.ndpn)
        data = {"displacement": d}
        if "v" in state:
            data["velocity"] = np.asarray(state["v"]).reshape(-1, self.f.ndpn)
        self.writer.write_step(float(state["t"]), data)
