"""Mesh tying: two tied blocks behave exactly like one continuous body
(the conforming-interface patch test, ref: mortar meshtying decks)."""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

E_MOD = 1000.0


def test_meshtying_patch_uniaxial():
    """Two stacked boxes with duplicate interface nodes, tied -> exact
    uniform uniaxial strain through both."""
    deck = dm.load(f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: statics, kinem: linear, numstep: 1, tolres: 1e-10, toldisp: 1e-11}}
solver: {{method: cg, precond: block_jacobi, maxiter: 2000}}
materials:
  1: {{type: stvenantkirchhoff, youngs: {E_MOD}, nue: 0.0}}
geometry:
  generator:
    - {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1, name: structure}}
    - {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1, name: structure,
        lo: [0, 0, 1], hi: [1, 1, 2], prefix: up_}}
conditions:
  dirichlet:
    - {{nodes: zmin, onoff: [0,0,1], val: [0,0,0]}}
    - {{nodes: xmin, onoff: [1,0,0], val: [0,0,0]}}
    - {{nodes: ymin, onoff: [0,1,0], val: [0,0,0]}}
    - {{nodes: up_zmax, onoff: [0,0,1], val: [0,0,0.2]}}
  meshtying:
    - {{slave: up_zmin, master: zmax}}
"""
    )
    res = driver.run(deck)
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    X = f.disc.coords
    # exact: uz = 0.1 * z (uniform strain over total height 2, top moves 0.2)
    assert np.abs(d[:, 2] - 0.1 * X[:, 2]).max() < 1e-9
    # tied interface nodes move identically
    up = f.disc.node_sets["up_zmin"]
    lo = f.disc.node_sets["zmax"]
    su = d[up][np.lexsort(X[up].T)]
    sl = d[lo][np.lexsort(X[lo].T)]
    assert np.abs(su - sl).max() < 1e-12
