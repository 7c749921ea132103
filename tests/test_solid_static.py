"""Static solid tests: patch tests over cell types, cantilever, deck runs.

Tier-2 analog of the reference's input-file regression tests with
RESULT DESCRIPTION (e.g. tests/input_files/solid_ele_hex8_old_timint.dat).
"""

import numpy as np
import pytest

from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC, NeumannBC
from fourc_tpu.io import deck as dm
from fourc_tpu.io.result_test import assert_result_tests
from fourc_tpu.materials import make_material
from fourc_tpu.physics import driver, solid as ps

MAT = {"type": "stvenantkirchhoff", "youngs": 1000.0, "nue": 0.3}


def _patch_field(disc, kinem="linear", stretch=0.1):
    mat = make_material(MAT)
    params = ps.SolidParams(kinem=kinem, dyntype="statics")
    dbc = [
        DirichletBC(disc.node_sets["xmin"], [1, 0, 0], [0, 0, 0]),
        DirichletBC(disc.node_sets["ymin"], [0, 1, 0], [0, 0, 0]),
        DirichletBC(disc.node_sets["zmin"], [0, 0, 1], [0, 0, 0]),
        DirichletBC(disc.node_sets["xmax"], [1, 0, 0], [stretch, 0, 0]),
    ]
    return ps.SolidField(disc, {1: mat}, params, dirichlet=dbc)


@pytest.mark.parametrize("cell", ["hex8", "hex20", "hex27", "tet4", "wedge6"])
def test_patch_uniaxial(cell):
    """Homogeneous uniaxial strain must be exact for every volume cell."""
    disc = gridgen.box(2, 2, 2, cell=cell)
    f = _patch_field(disc)
    state, stats = ps.make_step(f)(ps.init_state(f))
    assert bool(stats["converged"])
    d = np.asarray(state["d"]).reshape(-1, 3)
    ux = 0.1 * disc.coords[:, 0]
    uy = -0.03 * disc.coords[:, 1]
    uz = -0.03 * disc.coords[:, 2]
    assert np.abs(d[:, 0] - ux).max() < 1e-8
    assert np.abs(d[:, 1] - uy).max() < 1e-8
    assert np.abs(d[:, 2] - uz).max() < 1e-8


def test_patch_nonlinear_kinematics_svk():
    """Nonlinear kinematics with homogeneous F: still exact (no locking)."""
    disc = gridgen.box(2, 2, 2, cell="hex8")
    f = _patch_field(disc, kinem="nonlinear", stretch=0.2)
    state, stats = ps.make_step(f)(ps.init_state(f))
    assert bool(stats["converged"])
    d = np.asarray(state["d"]).reshape(-1, 3)
    # x-displacement linear in X exactly
    assert np.abs(d[:, 0] - 0.2 * disc.coords[:, 0]).max() < 1e-8
    # lateral contraction homogeneous (same for all nodes at same y)
    lat = d[:, 1] / np.where(disc.coords[:, 1] > 0, disc.coords[:, 1], 1.0)
    lat = lat[disc.coords[:, 1] > 0]
    assert np.ptp(lat) < 1e-8


def test_cantilever_converges_to_beam_theory():
    """Mesh refinement drives hex27 tip deflection to slender-beam value."""
    E, nu = 1000.0, 0.0
    L, h = 10.0, 1.0
    I = h**4 / 12.0
    q = -0.01  # traction on end face, total F = q*h^2
    delta_beam = q * h * h * L**3 / (3 * E * I)
    mat = make_material({"type": "stvenantkirchhoff", "youngs": E, "nue": nu})
    tips = []
    for nx in (4, 8):
        disc = gridgen.box(nx, 1, 1, hi=(L, h, h), cell="hex27")
        params = ps.SolidParams(kinem="linear", dyntype="statics")
        dbc = [DirichletBC(disc.node_sets["xmin"], [1, 1, 1], [0, 0, 0])]
        neu = [NeumannBC(disc.face_sets["xmax"], [0, 0, 1], [0, 0, q])]
        f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu)
        state, stats = ps.make_step(f)(ps.init_state(f))
        assert bool(stats["converged"])
        d = np.asarray(state["d"]).reshape(-1, 3)
        tips.append(d[disc.node_sets["xmax"], 2].mean())
    # within 2% of Euler-Bernoulli for the finer mesh
    assert abs(tips[1] - delta_beam) / abs(delta_beam) < 0.02


def test_neohooke_large_compression_newton():
    """Finite-strain Neo-Hooke under 30% compression: Newton must converge."""
    disc = gridgen.box(3, 3, 3, cell="hex8")
    mat = make_material({"type": "neohooke", "youngs": 100.0, "nue": 0.3})
    params = ps.SolidParams(kinem="nonlinear", dyntype="statics")
    dbc = [
        DirichletBC(disc.node_sets["zmin"], [0, 0, 1], [0, 0, 0]),
        DirichletBC(disc.node_sets["xmin"], [1, 0, 0], [0, 0, 0]),
        DirichletBC(disc.node_sets["ymin"], [0, 1, 0], [0, 0, 0]),
        DirichletBC(disc.node_sets["zmax"], [0, 0, 1], [0, 0, -0.3]),
    ]
    f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc)
    state, stats = ps.make_step(f)(ps.init_state(f))
    assert bool(stats["converged"])
    assert float(stats["resnorm"]) < 1e-8
    # volume must decrease but stay positive: J > 0 everywhere
    d = np.asarray(state["d"]).reshape(-1, 3)
    assert np.isfinite(d).all()


def test_plane_strain_quad4_patch():
    """2D wall elements (ref: src/w1) — plane-strain patch test."""
    disc = gridgen.rectangle(3, 3, cell="quad4")
    mat = make_material(MAT)
    params = ps.SolidParams(kinem="linear", dyntype="statics")
    dbc = [
        DirichletBC(disc.node_sets["xmin"], [1, 0], [0, 0]),
        DirichletBC(disc.node_sets["ymin"], [0, 1], [0, 0]),
        DirichletBC(disc.node_sets["xmax"], [1, 0], [0.1, 0]),
    ]
    f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc)
    state, stats = ps.make_step(f)(ps.init_state(f))
    assert bool(stats["converged"])
    d = np.asarray(state["d"]).reshape(-1, 2)
    assert np.abs(d[:, 0] - 0.1 * disc.coords[:, 0]).max() < 1e-8
    # plane strain lateral contraction factor: -nu/(1-nu) * 0.1
    fac = -0.3 / 0.7 * 0.1
    assert np.abs(d[:, 1] - fac * disc.coords[:, 1]).max() < 1e-8


def test_deck_with_result_description():
    deck = dm.load(
        """
problem: {type: structure}
structural_dynamic: {dynamictype: statics, kinem: nonlinear, numstep: 1}
solver: {method: cg, precond: block_jacobi}
materials:
  1: {type: neohooke, youngs: 1000.0, nue: 0.3}
functions:
  1: "t"
geometry:
  generator: {kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1,1,1], val: [0,0,0]}
  neumann:
    - {faces: xmax, onoff: [1,0,0], val: [20.0,0,0], funct: [1,0,0]}
result_description:
  - {node: 26, quantity: dispx, value: 0.019509, tolerance: 2e-3}
"""
    )
    res = driver.run(deck)
    assert_result_tests(deck.result_tests, res)


def test_body_force_gravity_balance():
    """Total reaction equals weight: sum(f_int at support) = rho*g*V."""
    deck = dm.load(
        """
problem: {type: structure}
structural_dynamic: {dynamictype: statics, kinem: linear, numstep: 1}
solver: {method: cg, precond: block_jacobi}
materials:
  1: {type: stvenantkirchhoff, youngs: 1000.0, nue: 0.0, density: 2.0}
geometry:
  generator: {kind: box, nx: 2, ny: 2, nz: 4, cell: hex8, mat: 1}
conditions:
  dirichlet:
    - {nodes: zmin, onoff: [1,1,1], val: [0,0,0]}
  body_force:
    - {val: [0, 0, -10.0]}
"""
    )
    res = driver.run(deck)
    st = res.states["structure"]
    f = res.fields["structure"].f
    # compression: top moves down by rho*g*L^2/(2E) = 2*10*1/(2*1000) = 0.01
    top = f.disc.node_sets["zmax"]
    uz = np.asarray(st["d"]).reshape(-1, 3)[top, 2]
    assert uz.mean() == pytest.approx(-0.01, rel=0.02)


def test_ptc_matches_full_newton():
    """Pseudo-transient continuation (ref: nln solver PTC) converges to the
    same equilibrium as full Newton; SER drives the pseudo time step to
    infinity so the final state is the true statics solution."""
    import numpy as np

    base = """
problem: {type: structure}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  numstep: 1
  maxiter: 60
  tolres: 1e-9
  toldisp: 1e-10
  nlnsol: %s
solver: {method: cg, precond: block_jacobi, maxiter: 2000}
materials:
  1: {type: neohooke, youngs: 200.0, nue: 0.3}
functions:
  1: "t"
geometry:
  generator:
    - {kind: box, nx: 4, ny: 2, nz: 2, cell: hex8, mat: 1, name: structure,
        lo: [0, 0, 0], hi: [2, 1, 1]}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1,1,1], val: [0,0,0]}
  neumann:
    - {faces: xmax, onoff: [0,0,1], val: [0,0,-12.0], funct: [0,0,1]}
"""
    r_newton = driver.run(dm.load(base % "fullnewton"))
    r_ptc = driver.run(dm.load(base % "ptc"))
    d_n = np.asarray(r_newton.states["structure"]["d"])
    d_p = np.asarray(r_ptc.states["structure"]["d"])
    assert np.allclose(d_n, d_p, atol=1e-7)
