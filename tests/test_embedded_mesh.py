"""Embedded-mesh solid-to-solid coupling (constraint_framework analog).

ref: src/constraint_framework embeddedmesh
(4C_constraint_framework_embeddedmesh_solid_to_solid_mortar_manager.hpp).

Oracles:
- volume fractions: a background element half-covered by the overlay gets
  stiffness scale 1/2 exactly (axis-aligned AABB path)
- patch test: a fine overlay slab embedded in a coarse background block
  under uniform compression reproduces the homogeneous-strain solution on
  BOTH bodies to penalty precision (the overlay floats — it is held only
  by the interface tie)
- the fully-overlapped background region is voided (scale 0)
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

pytestmark = pytest.mark.minimal

EPS_Z = 0.05


def _deck():
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: statics, kinem: linear, numstep: 1,
                     timestep: 1.0, maxiter: 30, tolres: 1e-9,
                     toldisp: 1e-12, normcombi: or}}
solver: {{method: direct}}
functions:
  1: "t"
materials:
  1: {{type: stvenantkirchhoff, youngs: 1000.0, nue: 0.0}}
geometry:
  generator:
    - {{kind: box, nx: 3, ny: 3, nz: 4, cell: hex8, mat: 1,
       name: structure}}
    - {{kind: box, nx: 4, ny: 4, nz: 2, cell: hex8, mat: 1,
       name: structure, lo: [0, 0, 0.25], hi: [1, 1, 0.75],
       prefix: ov_}}
conditions:
  dirichlet:
    - {{nodes: zmin, onoff: [0,0,1], val: [0,0,0]}}
    - {{nodes: [0], onoff: [1,1,0], val: [0,0,0]}}
    - {{nodes: [1], onoff: [0,1,0], val: [0,0,0]}}
    - {{nodes: zmax, onoff: [0,0,1], val: [0,0,-{EPS_Z}], funct: [0,0,1]}}
  embedded_mesh:
    - {{nodes: ov_all, penalty: 1e8}}
""")


def test_patch_uniform_compression():
    """Uniform strain must transfer exactly through the overlay: the
    background's overlapped material is voided by the exact AABB volume
    fractions and the floating overlay follows via the interface tie."""
    deck = _deck()
    res = driver.run(deck)
    f = res.fields["structure"].f
    X = np.asarray(f.disc.coords)
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    u_exact = np.zeros_like(X)
    u_exact[:, 2] = -EPS_Z * X[:, 2]
    # fully-voided background nodes are fictitious (deactivated)
    live = np.ones(len(X), bool)
    live[f.embedded_dead_nodes] = False
    assert len(f.embedded_dead_nodes) > 0  # the overlay interior is voided
    err = np.abs(d - u_exact)[live].max()
    # penalty coupling: exact up to traction/penalty ~ 50/1e8
    assert err < 2e-5, err
    # overlay nodes specifically (they have NO Dirichlet support)
    ov = f.disc.node_sets["ov_all"]
    assert np.abs(d[ov] - u_exact[ov]).max() < 2e-5


def test_volume_fractions_exact():
    deck = _deck()
    f = driver.run(deck).fields["structure"].f
    # background block: hex8 elements 3x3x4 over [0,1]^3 -> z-layers of
    # height 0.25; overlay spans z in [0.25, 0.75] -> layers 2 and 3 fully
    # voided, layers 1 and 4 untouched
    scale = np.asarray(f.elem_scale["hex8"])
    zmid = np.asarray(f.disc.coords)[
        np.asarray(f.disc.blocks["hex8"].conn)].mean(axis=1)[:, 2]
    assert np.allclose(scale[(zmid > 0.25) & (zmid < 0.75)], 0.0, atol=1e-12)
    assert np.allclose(scale[(zmid < 0.25) | (zmid > 0.75)], 1.0, atol=1e-12)


def test_half_covered_fraction():
    """Overlay covering the upper half of one background element row ->
    scale exactly 0.5 (AABB path)."""
    deck = dm.load("""
problem: {type: structure}
structural_dynamic: {dynamictype: statics, kinem: linear, numstep: 1,
                     timestep: 1.0}
solver: {method: direct}
materials:
  1: {type: stvenantkirchhoff, youngs: 100.0, nue: 0.0}
geometry:
  generator:
    - {kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1, name: structure}
    - {kind: box, nx: 2, ny: 2, nz: 1, cell: hex8, mat: 1, name: structure,
       lo: [0, 0, 0.25], hi: [1, 1, 0.75], prefix: ov_}
conditions:
  dirichlet:
    - {nodes: zmin, onoff: [1,1,1], val: [0,0,0]}
  embedded_mesh:
    - {nodes: ov_all, penalty: 1e6}
""")
    f = driver.run(deck).fields["structure"].f
    scale = np.asarray(f.elem_scale["hex8"])
    # every background element is half-covered (z spans 0..0.5 / 0.5..1.0,
    # overlay 0.25..0.75)
    assert np.allclose(scale, 0.5, atol=1e-12), scale
