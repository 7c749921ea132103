"""Framework/output tests (tier 3): VTU + PVD files, monitor CSV diff.

Analog of the reference's post-processing comparison harness
(ref: tests/output_test/vtk_compare.py, utilities/diff_with_tolerance.py).
"""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def test_vtu_output_roundtrip(tmp_path):
    out = str(tmp_path / "viz")
    deck = dm.load(f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: statics, kinem: linear, numstep: 2, timestep: 0.5}}
io: {{write_vtu: true, output_dir: "{out}", write_stress: true}}
solver: {{method: cg, precond: block_jacobi}}
functions:
  1: "t"
materials:
  1: {{type: stvenantkirchhoff, youngs: 1000.0, nue: 0.3}}
geometry:
  generator: {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1,1], val: [0,0,0]}}
    - {{nodes: xmax, onoff: [1,0,0], val: [0.1], funct: [1]}}
""")
    res = driver.run(deck)
    files = sorted(os.listdir(out))
    vtus = [f for f in files if f.endswith(".vtu")]
    pvds = [f for f in files if f.endswith(".pvd")]
    assert len(vtus) == 2 and len(pvds) == 1

    # well-formed XML with displacement point data and the right mesh sizes
    tree = ET.parse(os.path.join(out, vtus[-1]))
    piece = tree.getroot().find(".//Piece")
    assert int(piece.get("NumberOfPoints")) == 27
    assert int(piece.get("NumberOfCells")) == 8
    names = [da.get("Name") for da in piece.findall(".//PointData/DataArray")]
    assert "displacement" in names

    # pvd time series references both steps
    pvd = ET.parse(os.path.join(out, pvds[0]))
    steps = pvd.getroot().findall(".//DataSet")
    assert len(steps) == 2
    assert float(steps[-1].get("timestep")) == pytest.approx(1.0)


def test_ensight_output(tmp_path):
    out = str(tmp_path / "ens")
    deck = dm.load(f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: statics, kinem: linear, numstep: 2, timestep: 0.5}}
io: {{write_ensight: true, output_dir: "{out}"}}
solver: {{method: cg, precond: block_jacobi}}
functions:
  1: "t"
materials:
  1: {{type: stvenantkirchhoff, youngs: 1000.0, nue: 0.3}}
geometry:
  generator: {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1,1], val: [0,0,0]}}
    - {{nodes: xmax, onoff: [1,0,0], val: [0.1], funct: [1]}}
""")
    driver.run(deck)
    files = sorted(os.listdir(out))
    assert "structure.case" in files and "structure.geo" in files
    assert "structure.displacement.0000" in files
    assert "structure.displacement.0001" in files

    case = open(os.path.join(out, "structure.case")).read()
    assert "vector per node: 1 displacement structure.displacement.****" in case
    assert "number of steps: 2" in case

    geo = open(os.path.join(out, "structure.geo")).read().splitlines()
    assert "hexa8" in [ln.strip() for ln in geo]
    icoord = geo.index("coordinates")
    assert int(geo[icoord + 1]) == 27

    # variable file: 3 * n_nodes floats after the 4 header lines
    var = open(os.path.join(out, "structure.displacement.0001")).read().splitlines()
    vals = np.array([float(v) for v in var[4:]])
    assert vals.size == 3 * 27
    # xmax face pulled to 0.1 at t=1 in x
    assert vals[:27].max() == pytest.approx(0.1, rel=1e-6)


def test_monitor_csv_diff(tmp_path):
    from fourc_tpu.io.monitor import compare_csv

    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    a.write_text("step,val\n1,1.0\n2,2.0\n")
    b.write_text("step,val\n1,1.0\n2,2.0000000001\n")
    assert compare_csv(str(a), str(b), rtol=1e-8)
    c = tmp_path / "c.csv"
    c.write_text("step,val\n1,1.0\n2,2.1\n")
    with pytest.raises(AssertionError):
        compare_csv(str(a), str(c), rtol=1e-8)


def test_debug_verbosity_prints_newton_iterations(capfd):
    """io verbosity 'debug' emits per-Newton-iteration lines (the
    EveryIterationWriter / NOX printout analog)."""
    deck = dm.load("""
problem: {type: structure}
structural_dynamic: {dynamictype: statics, kinem: linear, numstep: 1,
                     timestep: 1.0, tolres: 1e-9, toldisp: 1e-9, normcombi: or}
io: {verbosity: debug}
solver: {method: cg, precond: block_jacobi}
functions:
  1: "t"
materials:
  1: {type: stvenantkirchhoff, youngs: 1000.0, nue: 0.3}
geometry:
  generator: {kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1,1,1], val: [0,0,0]}
    - {nodes: xmax, onoff: [1,0,0], val: [0.1], funct: [1]}
""")
    driver.run(deck)
    out = capfd.readouterr().out + capfd.readouterr().err
    assert "newton it 1" in out


def test_post_processor_app(tmp_path):
    """Offline post app: checkpoints -> VTU series + monitor CSV
    (the reference's apps/post_processor + post_monitor analog)."""
    ck = str(tmp_path / "ck")
    deck_path = tmp_path / "deck.yaml"
    deck_path.write_text(f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: statics, kinem: linear, numstep: 3,
                     timestep: 0.5, tolres: 1e-9, toldisp: 1e-9,
                     normcombi: or}}
io: {{output_dir: "{ck}", restart_interval: 1}}
solver: {{method: cg, precond: block_jacobi}}
functions:
  1: "t"
materials:
  1: {{type: stvenantkirchhoff, youngs: 1000.0, nue: 0.3}}
geometry:
  generator: {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1,1], val: [0,0,0]}}
    - {{nodes: xmax, onoff: [1,0,0], val: [0.1], funct: [1]}}
""")
    driver.run(dm.load(str(deck_path)))

    from fourc_tpu.app.post import main as post_main

    out = str(tmp_path / "viz")
    rc = post_main([str(deck_path), "--checkpoints", ck, "--format", "vtu",
                    "--out", out, "--monitor", "26:dispx"])
    assert rc == 0
    files = os.listdir(out)
    assert any(f.endswith(".vtu") for f in files)
    assert "structure.pvd" in files
    assert "monitor.csv" in files
    rows = open(os.path.join(out, "monitor.csv")).read().splitlines()
    assert len(rows) >= 3
    # ensight path
    out2 = str(tmp_path / "ens")
    rc = post_main([str(deck_path), "--checkpoints", ck,
                    "--format", "ensight", "--out", out2])
    assert rc == 0
    assert "structure.case" in os.listdir(out2)
