"""Beam-to-solid SURFACE contact (ref: src/geometry_pair line-to-surface
projection + beaminteraction beam-to-solid surface contact).

Oracle: a straight beam pressed down onto the top surface of an elastic
block (a) transfers its load into the block (surface deflects), (b) rests
at the surface offset by its cross-section radius (minus the penalty
penetration), and (c) contact is unilateral — lifting the beam leaves the
block force-free.
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def _deck(push):
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: statics, kinem: nonlinear, numstep: 4,
                     timestep: 0.25, maxiter: 40, tolres: 1e-8,
                     toldisp: 1e-10, normcombi: or, linesearch: true,
                     divercont: halve_step}}
solver: {{method: gmres, precond: block_jacobi, maxiter: 3000,
         gmres_restart: 100}}
functions:
  1: "t"
materials:
  1: {{type: stvenantkirchhoff, youngs: 2000.0, nue: 0.3}}
  2: {{type: beam_elastic, youngs: 1.0e6, area: 0.01, izz: 1e-5, iyy: 1e-5}}
geometry:
  generator:
    - {{kind: box, nx: 3, ny: 3, nz: 2, cell: hex8, mat: 1, name: structure}}
    - {{kind: line, n: 4, mat: 2, name: beams,
        p0: [0.0, 0.5, 1.06], p1: [1.0, 0.5, 1.06]}}
conditions:
  dirichlet:
    - {{nodes: zmin, onoff: [1,1,1], val: [0,0,0]}}
    - {{nodes: [0], onoff: [1,1,1,1,1,1], val: [0,0,{push},0,0,0],
        funct: [0,0,1,0,0,0], field: beams}}
    - {{nodes: [4], onoff: [1,1,1,1,1,1], val: [0,0,{push},0,0,0],
        funct: [0,0,1,0,0,0], field: beams}}
    - {{nodes: all, onoff: [0,0,0,1,1,1], val: [0,0,0,0,0,0], field: beams}}
  bts_surface_contact:
    - {{faces: zmax, penalty: 1.0e4, radius: 0.05}}
""")


def test_beam_presses_block_surface():
    res = driver.run(_deck(-0.04))
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"])
    n_s = f.n_s
    ds = d[:n_s].reshape(-1, 3)
    db = d[n_s:].reshape(-1, 6)
    top = f.solid.disc.node_sets["zmax"]
    # the block's top surface is pushed down under the beam
    assert ds[top, 2].min() < -1e-4
    # interior beam nodes ride the surface at ~radius offset: pressed ends
    # go to 1.06-0.04 = 1.02, the contact keeps the line near surface+r
    z_beam = 1.06 + db[:, 2]
    mid_surf = 1.0 + ds[top, 2].min()
    assert z_beam.min() > mid_surf + 0.05 - 0.02  # no deep tunneling
    assert np.all(np.isfinite(d))


def test_beam_lifted_block_force_free():
    """Pulling the beam UP leaves the block untouched (unilateral)."""
    deck = _deck(0.0)
    raw = dict(deck.raw)
    import yaml

    src = f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: statics, kinem: nonlinear, numstep: 2,
                     timestep: 0.5, maxiter: 30, tolres: 1e-9,
                     toldisp: 1e-11, normcombi: or}}
solver: {{method: gmres, precond: block_jacobi, maxiter: 2000,
         gmres_restart: 80}}
functions:
  1: "t"
materials:
  1: {{type: stvenantkirchhoff, youngs: 2000.0, nue: 0.3}}
  2: {{type: beam_elastic, youngs: 1.0e6, area: 0.01, izz: 1e-5, iyy: 1e-5}}
geometry:
  generator:
    - {{kind: box, nx: 3, ny: 3, nz: 2, cell: hex8, mat: 1, name: structure}}
    - {{kind: line, n: 4, mat: 2, name: beams,
        p0: [0.0, 0.5, 1.06], p1: [1.0, 0.5, 1.06]}}
conditions:
  dirichlet:
    - {{nodes: zmin, onoff: [1,1,1], val: [0,0,0]}}
    - {{nodes: all, onoff: [1,1,1,1,1,1], val: [0,0,0.1,0,0,0],
        funct: [0,0,1,0,0,0], field: beams}}
  bts_surface_contact:
    - {{faces: zmax, penalty: 1.0e4, radius: 0.05}}
"""
    res = driver.run(dm.load(src))
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"])
    ds = d[: f.n_s]
    assert np.abs(ds).max() < 1e-9  # block untouched
