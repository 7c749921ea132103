"""Beam-to-solid volume mesh tying tests (embedded fibers).

Oracles mirror the reference's BTS-VMT behavior (ref: src/beaminteraction
beam-to-solid volume meshtying): the tie constrains beam nodes to the host
solid displacement field; a stiff embedded fiber stiffens the structure.
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def _deck(beam_E, nx=6):
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic:
  dynamictype: statics
  kinem: linear
  numstep: 1
  timestep: 1.0
  maxiter: 15
  tolres: 1e-8
  toldisp: 1e-8
  normcombi: or
  bts_penalty: 1e5
solver: {{method: direct}}
materials:
  1: {{type: stvenantkirchhoff, youngs: 100.0, nue: 0.3}}
  2: {{type: beam_elastic, youngs: {beam_E}, area: 0.01, iyy: 1e-5,
       izz: 1e-5, density: 0.0}}
functions:
  1: "t"
geometry:
  generator:
    - {{kind: box, nx: {nx}, ny: 2, nz: 2, cell: hex8, mat: 1,
        name: structure, lo: [0, 0, 0], hi: [3, 0.5, 0.5]}}
    - {{kind: line, n: {nx}, p0: [0.01, 0.25, 0.25], p1: [2.99, 0.25, 0.25],
        name: beams, mat: 2}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1,1], val: [0,0,0]}}
  neumann:
    - {{faces: xmax, onoff: [1,0,0], val: [2.0,0,0], funct: [1,0,0]}}
""")


def _tip_ux(res):
    f = res.fields["structure"].f
    solid = getattr(f, "solid", f)
    d = np.asarray(res.states["structure"]["d"])[: solid.ndof].reshape(-1, 3)
    return d[solid.disc.node_sets["xmax"], 0].mean()


def test_embedded_fiber_stiffens_tension():
    """Axial pull: stiff fiber (EA_fiber = 10 * EA_solid-ish) must cut the
    elongation substantially vs a negligible fiber."""
    u_soft = _tip_ux(driver.run(_deck(beam_E=1e-6)))
    u_stiff = _tip_ux(driver.run(_deck(beam_E=1e6)))
    assert u_stiff < 0.55 * u_soft, (u_stiff, u_soft)


def test_negligible_fiber_matches_plain_solid():
    """A zero-stiffness fiber must not alter the solid solution."""
    deck_plain = _deck(beam_E=1e-6)
    del deck_plain.disc["beams"]
    u_plain = _tip_ux(driver.run(deck_plain))
    u_soft = _tip_ux(driver.run(_deck(beam_E=1e-6)))
    assert abs(u_soft - u_plain) < 2e-3 * abs(u_plain)


def test_tie_constraint_satisfied():
    """Beam node displacements match the interpolated solid field."""
    res = driver.run(_deck(beam_E=1e6))
    f = res.fields["structure"].f
    us, ub = f.split(res.states["structure"]["d"])
    us = np.asarray(us).reshape(-1, 3)
    ub = np.asarray(ub).reshape(-1, 6)[:, :3]
    tie = f.tie
    interp = np.einsum("bk,bkd->bd", np.asarray(tie.wts),
                       us[np.asarray(tie.host_conn)])
    gap = ub[np.asarray(tie.beam_nodes)] - interp
    assert np.abs(gap).max() < 5e-3 * max(np.abs(us).max(), 1e-30)
