"""Non-matching mortar meshtying tests.

Oracle: the mortar PATCH TEST — two stacked blocks with NON-matching
interface meshes (3x3 vs 2x2 faces) under uniform uniaxial compression
must transmit a spatially uniform stress/strain state exactly (flat
interface + dual-lumped D passes the patch test; ref: src/mortar D/M
assembly 4C_mortar_interface.cpp:3366,3444 and the reference's
meshtying patch-test decks).
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

E_MOD = 1000.0
PUSH = -0.04


def _deck():
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  numstep: 2
  timestep: 0.5
  maxiter: 30
  tolres: 1e-9
  toldisp: 1e-11
solver: {{method: gmres, precond: block_jacobi, maxiter: 3000, gmres_restart: 100}}
materials:
  1: {{type: stvenantkirchhoff, youngs: {E_MOD}, nue: 0.0}}
functions:
  1: "t"
geometry:
  generator:
    - {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1, name: structure}}
    - {{kind: box, nx: 3, ny: 3, nz: 2, cell: hex8, mat: 1, name: structure,
        lo: [0, 0, 1], hi: [1, 1, 2], prefix: up_}}
conditions:
  dirichlet:
    - {{nodes: zmin, onoff: [1,1,1], val: [0,0,0]}}
    - {{nodes: up_zmax, onoff: [0,0,1], val: [0,0,{PUSH}], funct: [0,0,1]}}
  meshtying:
    - {{slave_faces: up_zmin, master_faces: zmax}}
""")


def test_mortar_patch_test():
    res = driver.run(_deck())
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    X = np.asarray(f.disc.coords)

    # uniform strain: u_z = eps * z with eps = PUSH / 2 (total height 2)
    eps = PUSH / 2.0
    uz_ref = eps * X[:, 2]
    assert np.abs(d[:, 2] - uz_ref).max() < 5e-6
    # interface continuity: slave-side nodes move with the master surface
    up_bot = f.disc.node_sets["up_zmin"]
    assert np.allclose(d[up_bot, 2], eps * 1.0, atol=5e-6)
    # no parasitic lateral displacement (nue = 0)
    assert np.abs(d[:, :2]).max() < 5e-6


def test_mortar_weights_partition_of_unity():
    from fourc_tpu.coupling.mortar import mortar_interpolation
    from fourc_tpu.physics import structure_driver

    deck = _deck()
    disc = deck.disc["structure"]
    sn, mids, ws = mortar_interpolation(
        disc.coords, disc.face_sets["up_zmin"], disc.face_sets["zmax"])
    assert np.allclose(ws.sum(axis=1), 1.0, atol=1e-12)
    # interpolation reproduces linear fields: sum_k w_k x_m(k) == x_s
    xs = np.asarray(disc.coords)[sn]
    xm = np.asarray(disc.coords)[mids]  # (S, K, 3)
    xrec = np.einsum("sk,skd->sd", ws, xm)
    assert np.abs(xrec[:, :2] - xs[:, :2]).max() < 1e-10
