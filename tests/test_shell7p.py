"""7-parameter shell tests.

Oracles follow the reference's shell7p verification style: thin-limit
cantilever bending vs beam theory, and the defining 7p property — an
unmodified 3D material gives the PLANE-STRESS membrane answer because the
extensible director supplies the thickness strain (ref: src/shell7p).
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

E_MOD = 1.0e6
NUE = 0.3
T = 0.1


def _deck(nx, ny, L, W, load_line, nue=NUE, numstep=1, law="svk",
          maxiter=30):
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  numstep: {numstep}
  timestep: {1.0 / numstep}
  maxiter: {maxiter}
  tolres: 1e-9
  toldisp: 1e-10
  normcombi: or
solver: {{method: direct}}
functions:
  1: "t"
materials:
  1: {{type: shell7p, youngs: {E_MOD}, nue: {nue}, thickness: {T},
      law: {law}}}
geometry:
  generator:
    - {{kind: sheet, nx: {nx}, ny: {ny}, origin: [0, 0, 0],
       u: [{L}, 0, 0], v: [0, {W}, 0], cell: quad4, mat: 1,
       name: structure}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1, 1, 1, 1, 1, 1, 1], val: [0, 0, 0, 0, 0, 0, 0]}}
{load_line}
""")


@pytest.mark.minimal
def test_cantilever_thin_limit():
    """Tip-loaded plate strip: w = P L^3 / (3 E I), nu = 0."""
    L, W = 4.0, 0.5
    Iz = W * T**3 / 12.0
    P = 1e-3 * 3 * E_MOD * Iz / L**3  # target tip deflection 1e-3 (linear)
    load = f"""  point_neumann:
    - {{nodes: xmax, onoff: [0, 0, 1, 0, 0, 0, 0],
        val: [0, 0, {P / 3.0}], funct: [0, 0, 1]}}"""
    # 3 nodes along xmax (ny=2) share the load
    res = driver.run(_deck(16, 2, L, W, load, nue=0.0))
    w = max(res.query("structure", "dispz", i)
            for i in range(next(iter(res.deck.disc.values())).n_nodes))
    assert abs(w - 1e-3) / 1e-3 < 0.03


@pytest.mark.minimal
def test_plane_stress_membrane_response():
    """Uniaxial stretch with nu = 0.3 and an UNMODIFIED 3D SVK law: the
    force-displacement slope must be the plane-stress stiffness E (not the
    laterally constrained 3D modulus) — the defining 7-parameter feature."""
    L, W = 1.0, 1.0
    ux = 1e-4
    load = f"""  dirichlet_extra: []"""
    deck = dm.load(f"""
problem: {{type: structure}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  numstep: 1
  timestep: 1.0
  maxiter: 30
  tolres: 1e-11
  toldisp: 1e-12
  normcombi: or
solver: {{method: direct}}
functions:
  1: "t"
materials:
  1: {{type: shell7p, youngs: {E_MOD}, nue: {NUE}, thickness: {T}, law: svk}}
geometry:
  generator:
    - {{kind: sheet, nx: 4, ny: 4, origin: [0, 0, 0],
       u: [{L}, 0, 0], v: [0, {W}, 0], cell: quad4, mat: 1,
       name: structure}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1, 0, 1, 0, 0, 0, 0], val: [0, 0, 0, 0, 0, 0, 0]}}
    - {{nodes: ymin, onoff: [0, 1, 0, 0, 0, 0, 0], val: [0, 0, 0, 0, 0, 0, 0]}}
    - {{nodes: xmax, onoff: [1, 0, 0, 0, 0, 0, 0],
        val: [{ux}, 0, 0, 0, 0, 0, 0], funct: [1, 0, 0, 0, 0, 0, 0]}}
""")
    res = driver.run(deck)
    f = res.fields["structure"].f
    st = res.states["structure"]
    # reaction force on the loaded edge from the internal force
    import jax.numpy as jnp

    fint, _ = f.internal_force(jnp.asarray(st["d"]))
    fint = np.asarray(fint).reshape(-1, 7)
    xmax_nodes = np.asarray(f.disc.node_sets["xmax"])
    Fx = fint[xmax_nodes, 0].sum()
    # plane stress: F = E * t * W * eps (linear limit)
    F_ps = E_MOD * T * W * ux
    F_3d = E_MOD * (1 - NUE) / ((1 + NUE) * (1 - 2 * NUE)) * T * W * ux
    assert abs(Fx - F_ps) / F_ps < 0.02, (Fx, F_ps, F_3d)
    # and be sure we're NOT returning the constrained 3D answer
    assert abs(Fx - F_3d) / F_3d > 0.2
    # lateral contraction (Poisson) visible in dispy, thinning in beta
    d = np.asarray(st["d"]).reshape(-1, 7)
    ymax_nodes = np.asarray(f.disc.node_sets["ymax"])
    uy = d[ymax_nodes, 1].mean()
    assert abs(uy - (-NUE * ux * W / L)) / (NUE * ux) < 0.05


def test_large_deflection_converges():
    """Moderate large-deflection bending stays convergent and sensible."""
    L, W = 2.0, 0.5
    load = """  point_neumann:
    - {nodes: xmax, onoff: [0, 0, 1, 0, 0, 0, 0],
        val: [0, 0, 20.0], funct: [0, 0, 1]}"""
    res = driver.run(_deck(10, 2, L, W, load, nue=0.0, numstep=4,
                           law="neohooke"))
    n = next(iter(res.deck.disc.values())).n_nodes
    w = max(res.query("structure", "dispz", i) for i in range(n))
    ux = min(res.query("structure", "dispx", i) for i in range(n))
    assert 0.1 < w < 2.0  # visibly nonlinear but finite
    assert ux < -1e-4  # tip pulls inward (geometric nonlinearity)
