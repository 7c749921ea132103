"""Exodus II reader tests (netCDF3-classic parser).

Fixture files are written with scipy's independent netCDF writer, laid out
exactly like SEACAS Exodus II output (ref: src/core/io/src/4C_io_exodus.cpp
reads the same layout).
"""

import numpy as np
import pytest

from fourc_tpu.core import gridgen
from fourc_tpu.io.exodus import read_exodus


def _write_exodus(path, coords, blocks, node_sets, version=1):
    """blocks: [(elem_type, conn 0-based)]; node_sets: {name: ids}."""
    from scipy.io import netcdf_file

    f = netcdf_file(str(path), "w", version=version)
    nnod, ndim = coords.shape
    f.createDimension("num_dim", ndim)
    f.createDimension("num_nodes", nnod)
    f.createDimension("num_el_blk", len(blocks))
    f.createDimension("len_string", 33)

    for ax in range(ndim):
        v = f.createVariable("coord" + "xyz"[ax], "d", ("num_nodes",))
        v[:] = coords[:, ax]

    ids = f.createVariable("eb_prop1", "i", ("num_el_blk",))
    ids[:] = np.arange(1, len(blocks) + 1)
    for b, (etype, conn) in enumerate(blocks):
        nblk, npe = conn.shape
        f.createDimension(f"num_el_in_blk{b + 1}", nblk)
        f.createDimension(f"num_nod_per_el{b + 1}", npe)
        v = f.createVariable(f"connect{b + 1}", "i",
                             (f"num_el_in_blk{b + 1}",
                              f"num_nod_per_el{b + 1}"))
        v[:] = conn + 1
        v._attributes["elem_type"] = etype

    if node_sets:
        f.createDimension("num_node_sets", len(node_sets))
        nsids = f.createVariable("ns_prop1", "i", ("num_node_sets",))
        nsids[:] = np.arange(1, len(node_sets) + 1)
        names = f.createVariable("ns_names", "c",
                                 ("num_node_sets", "len_string"))
        arr = np.zeros((len(node_sets), 33), "S1")
        for s, nm in enumerate(node_sets):
            for k, ch in enumerate(nm.encode()):
                arr[s, k] = bytes([ch])
        names[:] = arr
        for s, (nm, idlist) in enumerate(node_sets.items()):
            f.createDimension(f"num_nod_ns{s + 1}", len(idlist))
            v = f.createVariable(f"node_ns{s + 1}", "i", (f"num_nod_ns{s + 1}",))
            v[:] = np.asarray(idlist) + 1
    f.close()


@pytest.mark.parametrize("version", [1, 2])
def test_exodus_roundtrip_box(tmp_path, version):
    ref = gridgen.box(2, 2, 2, cell="hex8")
    path = tmp_path / "box.e"
    _write_exodus(path, np.asarray(ref.coords),
                  [("HEX8", np.asarray(ref.blocks["hex8"].conn))],
                  {"xmin": np.asarray(ref.node_sets["xmin"]),
                   "zmax": np.asarray(ref.node_sets["zmax"])},
                  version=version)
    d = read_exodus(path)
    assert np.allclose(d.coords, np.asarray(ref.coords))
    assert np.array_equal(d.blocks["hex8"].conn,
                          np.asarray(ref.blocks["hex8"].conn))
    assert np.array_equal(sorted(d.node_sets["xmin"]),
                          sorted(np.asarray(ref.node_sets["xmin"])))
    assert np.array_equal(sorted(d.node_sets["zmax"]),
                          sorted(np.asarray(ref.node_sets["zmax"])))


def test_exodus_mesh_solves(tmp_path):
    """A deck whose geometry comes from an Exodus file runs end to end."""
    from fourc_tpu.io import deck as dm
    from fourc_tpu.physics import driver

    ref = gridgen.box(2, 2, 2, cell="hex8")
    path = tmp_path / "mesh.e"
    _write_exodus(path, np.asarray(ref.coords),
                  [("HEX8", np.asarray(ref.blocks["hex8"].conn))],
                  {"xmin": np.asarray(ref.node_sets["xmin"]),
                   "xmax": np.asarray(ref.node_sets["xmax"])})
    res = driver.run(dm.load(f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: statics, kinem: linear, numstep: 1,
                     timestep: 1.0, tolres: 1e-9, toldisp: 1e-9, normcombi: or}}
solver: {{method: cg, precond: block_jacobi}}
functions:
  1: "t"
materials:
  1: {{type: stvenantkirchhoff, youngs: 1000.0, nue: 0.0}}
geometry:
  exodus: {{file: "{path}", name: structure}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1,1], val: [0,0,0]}}
    - {{nodes: xmax, onoff: [1,0,0], val: [0.02], funct: [1]}}
"""))
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    x = np.asarray(res.fields["structure"].f.disc.coords)
    assert np.allclose(d[:, 0], 0.02 * x[:, 0], atol=2e-7)


def test_exodus_rejects_hdf5(tmp_path):
    p = tmp_path / "h5.e"
    p.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError, match="classic"):
        read_exodus(p)
