"""Exodus II mesh reader (self-contained netCDF3-classic parser).

Counterpart of the reference's Exodus input path
(ref: src/core/io/src/4C_io_exodus.cpp — reads SEACAS Exodus II meshes:
coordinates, element blocks with type strings, node sets, side sets; used
by MeshReader 4C_io_meshreader.hpp:43).

Exodus II files are netCDF; the classic (CDF-1/CDF-2) container is parsed
here directly with numpy — no external I/O libraries — matching the
reference's capability without the SEACAS dependency.  HDF5-based (netCDF4)
Exodus files are detected and rejected with a clear message.
"""

from __future__ import annotations

import struct

import numpy as np

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

_TYPE = {
    1: ("b", 1), 2: ("S1", 1), 3: (">i2", 2), 4: (">i4", 4),
    5: (">f4", 4), 6: (">f8", 8),
}


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def i4(self):
        v = struct.unpack_from(">i", self.d, self.p)[0]
        self.p += 4
        return v

    def i8(self):
        v = struct.unpack_from(">q", self.d, self.p)[0]
        self.p += 8
        return v

    def name(self):
        n = self.i4()
        s = self.d[self.p:self.p + n].decode("ascii")
        self.p += (n + 3) // 4 * 4  # pad to 4
        return s

    def values(self, nc_type, n):
        dt, sz = _TYPE[nc_type]
        nbytes = n * sz
        arr = np.frombuffer(self.d, dtype=dt, count=n, offset=self.p)
        self.p += (nbytes + 3) // 4 * 4
        if nc_type == 2:
            return arr.tobytes().decode("ascii", errors="replace")
        return arr

    def att_list(self):
        tag = self.i4()
        count = self.i4()
        out = {}
        if tag == 0 and count == 0:
            return out
        assert tag == _NC_ATTRIBUTE, tag
        for _ in range(count):
            nm = self.name()
            typ = self.i4()
            n = self.i4()
            out[nm] = self.values(typ, n)
        return out


def _parse_netcdf3(data: bytes):
    """Returns (dims list[(name, size)], gattrs, vars dict
    name -> (dimids, attrs, nc_type, begin))."""
    if data[:3] != b"CDF":
        if data[:8] == b"\x89HDF\r\n\x1a\n":
            raise ValueError(
                "netCDF4/HDF5-based Exodus file; re-export in classic "
                "format (e.g. `ncks -3`) — only CDF-1/2 is parsed here")
        raise ValueError("not a netCDF classic file")
    version = data[3]
    if version not in (1, 2):
        raise ValueError(f"unsupported netCDF version byte {version}")
    r = _Reader(data)
    r.p = 4
    numrecs = r.i4()
    dims = []
    tag = r.i4()
    count = r.i4()
    if count:
        assert tag == _NC_DIMENSION, tag
        for _ in range(count):
            nm = r.name()
            dims.append((nm, r.i4()))
    gattrs = r.att_list()
    out = {}
    tag = r.i4()
    count = r.i4()
    if count:
        assert tag == _NC_VARIABLE, tag
        for _ in range(count):
            nm = r.name()
            ndims = r.i4()
            dimids = [r.i4() for _ in range(ndims)]
            vattrs = r.att_list()
            nc_type = r.i4()
            _vsize = r.i4()
            begin = r.i8() if version == 2 else r.i4()
            out[nm] = (dimids, vattrs, nc_type, begin)
    return dims, gattrs, out, numrecs


class ExodusFile:
    """Parsed Exodus II mesh container."""

    def __init__(self, path):
        with open(path, "rb") as fh:
            data = fh.read()
        self.dims, self.gattrs, self._vars, self.numrecs = _parse_netcdf3(data)
        self._data = data
        self._dimsize = {i: d[1] for i, d in enumerate(self.dims)}
        self._rec_dim = next((i for i, d in enumerate(self.dims)
                              if d[1] == 0), None)

    def var(self, name):
        """Read a (non-record) variable fully as a numpy array / string."""
        dimids, _atts, nc_type, begin = self._vars[name]
        shape = tuple(self._dimsize[i] for i in dimids)
        if self._rec_dim in dimids:
            shape = (self.numrecs,) + tuple(
                self._dimsize[i] for i in dimids if i != self._rec_dim)
        n = int(np.prod(shape)) if shape else 1
        dt, _sz = _TYPE[nc_type]
        arr = np.frombuffer(self._data, dtype=dt, count=n, offset=begin)
        if nc_type == 2:
            return arr.reshape(shape)
        return arr.reshape(shape)

    def var_attr(self, name, att):
        return self._vars[name][1].get(att)

    def __contains__(self, name):
        return name in self._vars


_ELEM_TYPE = {
    "HEX": "hex8", "HEX8": "hex8", "HEX20": "hex20", "HEX27": "hex27",
    "TETRA": "tet4", "TETRA4": "tet4", "TET4": "tet4", "TETRA10": "tet10",
    "TET10": "tet10", "WEDGE": "wedge6", "WEDGE6": "wedge6",
    "PYRAMID": "pyramid5", "PYRAMID5": "pyramid5",
    "QUAD": "quad4", "QUAD4": "quad4", "QUAD8": "quad8", "QUAD9": "quad9",
    "SHELL": "quad4", "SHELL4": "quad4",
    "TRI": "tri3", "TRI3": "tri3", "TRI6": "tri6", "TRIANGLE": "tri3",
    "BAR": "line2", "BAR2": "line2", "BEAM": "line2", "BEAM2": "line2",
    "TRUSS": "line2", "LINE2": "line2",
}


def _names_list(exo, var):
    """Decode an Exodus names variable ((n, len_string) char array)."""
    if var not in exo:
        return None
    raw = exo.var(var)
    out = []
    for row in raw:
        s = row.tobytes().decode("ascii", errors="replace")
        out.append(s.split("\x00", 1)[0].strip())
    return out


def read_exodus(path, name="structure", mat_id=1):
    """Read an Exodus II mesh -> Discretization.

    Element blocks keep their Exodus block ids as material ids (the
    reference maps block id -> element/material section in the deck);
    node sets come in by name (or ns<ID>).
    """
    from fourc_tpu.core.mesh import Discretization

    exo = ExodusFile(path)
    ndim = dict(exo.dims)["num_dim"]
    nnod = dict(exo.dims)["num_nodes"]

    if "coord" in exo:
        coords = exo.var("coord").reshape(ndim, nnod).T.astype(np.float64)
    else:
        axes = [exo.var(f"coord{ax}") for ax in "xyz"[:ndim]]
        coords = np.stack(axes, axis=1).astype(np.float64)

    d = Discretization(name=name, coords=coords)

    n_blocks = dict(exo.dims).get("num_el_blk", 0)
    ids = exo.var("eb_prop1") if "eb_prop1" in exo else np.arange(1, n_blocks + 1)
    for b in range(n_blocks):
        cvar = f"connect{b + 1}"
        etype = exo.var_attr(cvar, "elem_type")
        etype = (etype or "").strip().strip("\x00").upper()
        cell = _ELEM_TYPE.get(etype)
        if cell is None:
            raise ValueError(f"unsupported Exodus elem_type {etype!r}")
        conn = np.asarray(exo.var(cvar), np.int64) - 1  # 1-based -> 0-based
        nblk = dict(exo.dims)[f"num_el_in_blk{b + 1}"]
        npe = dict(exo.dims)[f"num_nod_per_el{b + 1}"]
        d.add_block(cell, conn.reshape(nblk, npe).astype(np.int32),
                    int(ids[b]))

    ns_names = _names_list(exo, "ns_names")
    n_ns = dict(exo.dims).get("num_node_sets", 0)
    ns_ids = exo.var("ns_prop1") if "ns_prop1" in exo else np.arange(1, n_ns + 1)
    for s in range(n_ns):
        nodes = np.asarray(exo.var(f"node_ns{s + 1}"), np.int64) - 1
        nm = None
        if ns_names and s < len(ns_names) and ns_names[s]:
            nm = ns_names[s]
        d.node_sets[nm or f"ns{int(ns_ids[s])}"] = nodes.astype(np.int32)
    d.node_sets.setdefault("all", np.arange(nnod, dtype=np.int32))
    return d
