"""Gmsh debug output tests (ref: src/core/io/src/4C_io_gmsh.cpp)."""

import numpy as np

from fourc_tpu.core import gridgen
from fourc_tpu.io.gmsh import write_msh


def test_gmsh_msh_roundtrip_structure(tmp_path):
    d = gridgen.box(2, 2, 2, cell="hex8")
    path = tmp_path / "dbg.msh"
    disp = np.random.default_rng(0).standard_normal((d.n_nodes, 3))
    write_msh(path, np.asarray(d.coords), d.blocks,
              point_data={"displacement": disp})
    txt = path.read_text()
    assert "$MeshFormat" in txt and "$Nodes" in txt
    assert txt.count("\n5 ") >= 0  # hex8 type id 5 present in element lines
    assert f"$Elements\n{d.n_elements}\n" in txt
    assert '"displacement"' in txt
    # node count header
    assert f"$Nodes\n{d.n_nodes}\n" in txt
