"""Beam-to-beam contact tests.

Oracle (ref: src/beamcontact closest-point penalty pairs): two crossing
beams pressed together must not interpenetrate beyond the penalty
regularization, and separate cleanly when not loaded.
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

R = 0.05


def _deck(push):
    # beam A along x at z=0 (clamped ends); beam B along y at z=2R+0.02,
    # pushed DOWN at its ends by `push`
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: statics, kinem: linear, numstep: 2,
                     timestep: 0.5, maxiter: 30, tolres: 1e-8,
                     toldisp: 1e-9, normcombi: or, linesearch: true}}
solver: {{method: direct}}
functions:
  1: "t"
materials:
  1: {{type: beam_elastic, youngs: 1e6, area: 0.008, iyy: 5e-6, izz: 5e-6,
       density: 0.0}}
geometry:
  generator:
    - {{kind: line, n: 8, p0: [-1, 0, 0], p1: [1, 0, 0], name: structure,
        mat: 1}}
    - {{kind: line, n: 8, p0: [0, -1, {2 * R + 0.02}],
        p1: [0, 1, {2 * R + 0.02}], name: structure, mat: 1, prefix: b_}}
conditions:
  dirichlet:
    - {{nodes: start, onoff: [1,1,1,1,1,1], val: [0,0,0,0,0,0]}}
    - {{nodes: end, onoff: [1,1,1,1,1,1], val: [0,0,0,0,0,0]}}
    - {{nodes: b_start, onoff: [1,1,1,1,1,1], val: [0,0,{-push},0,0,0],
        funct: [0,0,1,0,0,0]}}
    - {{nodes: b_end, onoff: [1,1,1,1,1,1], val: [0,0,{-push},0,0,0],
        funct: [0,0,1,0,0,0]}}
  beam_contact:
    - {{radius: {R}, penalty: 5e4}}
""")


def _gap(res):
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 6)[:, :3]
    x = np.asarray(f.disc.coords) + d
    # midpoints of the two beams (crossing point x=y=0)
    a = x[np.argmin(np.abs(f.disc.coords[:, 0]) + np.abs(f.disc.coords[:, 2]))]
    nb = f.disc.coords.shape[0]
    sel_b = np.abs(f.disc.coords[:, 2]) > R  # upper beam nodes
    xb = x[sel_b]
    b = xb[np.argmin(np.abs(xb[:, 1]))]
    return float(b[2] - a[2])


def test_beam_contact_prevents_penetration():
    res = driver.run(_deck(push=0.2))
    g = _gap(res)
    # centers stay >= 2R apart up to the penalty regularization
    assert g > 2 * R - 0.02, g
    # and the lower beam was pushed down (load transmitted)
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 6)
    f = res.fields["structure"].f
    lower_mid = np.argmin(np.abs(f.disc.coords[:, 0]) + np.abs(f.disc.coords[:, 2]))
    assert d[lower_mid, 2] < -1e-4


def test_beam_contact_inactive_when_apart():
    res = driver.run(_deck(push=0.0))
    d = np.asarray(res.states["structure"]["d"])
    assert np.abs(d).max() < 1e-10
