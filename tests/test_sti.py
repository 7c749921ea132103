"""STI (scatra-thermo interaction): Soret steady state.

Oracle: thermodiffusive equilibrium.  With a prescribed linear T(x) and an
insulated solute, the steady Soret balance  grad c + S_T c grad T = 0
gives  c(x) = A exp(-S_T T(x)),  A fixed by mass conservation
(ref: src/sti monolithic + 4C_mat_soret.* — same physics).
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

S_T = 2.0
D = 0.1


def _deck(numstep=60, dt=0.5, n=10):
    return dm.load(f"""
problem: {{type: sti}}
scatra_dynamic:
  dynamictype: onesteptheta
  theta: 1.0
  initialfield_funct: 1
  tolres: 1e-10
  toldisp: 1e-11
thermal_dynamic:
  dynamictype: onesteptheta
  theta: 1.0
  tolres: 1e-10
  toldisp: 1e-11
sti_dynamic:
  timestep: {dt}
  numstep: {numstep}
solver: {{method: gmres, precond: jacobi, maxiter: 2000, gmres_restart: 80}}
materials:
  1:
    type: soret
    diffusivity: {D}
    soret: {S_T}
  2:
    type: fourier
    conductivity: 1.0
    capacity: 1.0
    density: 1.0
functions:
  1: "1"
geometry:
  generator:
    - {{kind: box, nx: {n}, ny: 1, nz: 1, cell: hex8, mat: 1, name: scatra,
        lo: [0, 0, 0], hi: [1.0, 0.1, 0.1]}}
    - {{kind: box, nx: {n}, ny: 1, nz: 1, cell: hex8, mat: 2, name: thermo,
        lo: [0, 0, 0], hi: [1.0, 0.1, 0.1]}}
conditions:
  dirichlet:
    - {{field: thermo, nodes: xmin, onoff: [1], val: [0.0]}}
    - {{field: thermo, nodes: xmax, onoff: [1], val: [1.0]}}
""")


def test_soret_steady_profile():
    res = driver.run(_deck())
    state = res.states["sti"]
    f = res.fields["sti"].f
    X = np.asarray(f.scat.disc.coords)
    c = np.asarray(state["c"])
    T = np.asarray(state["T"])
    x = X[:, 0]
    # temperature reached the linear steady profile
    np.testing.assert_allclose(T, x, atol=2e-3)
    # Soret equilibrium: c = A exp(-S_T x), A from mass conservation
    A = S_T / (1.0 - np.exp(-S_T))
    want = A * np.exp(-S_T * x)
    np.testing.assert_allclose(c, want, rtol=0.02)
    # total mass conserved (lumped nodal integral, uniform column)
    w = np.where((x > 1e-9) & (x < 1 - 1e-9), 1.0, 0.5)
    assert np.sum(w * c) / np.sum(w) == pytest.approx(1.0, rel=1e-6)


def test_sti_joule_heating_smoke():
    """q_joule > 0 with a sustained solute flux (concentration BCs) raises
    the interior temperature above the pure-conduction profile (sanity of
    the dissipative back-coupling; at Soret equilibrium j = 0, so the
    flux must be driven)."""
    deck = _deck(numstep=20, dt=0.5)
    deck.sections["sti_dynamic"]["q_joule"] = 5.0
    from fourc_tpu.core.conditions import DirichletBC

    f_sc = deck.conditions.setdefault("scatra", {})
    disc = deck.disc["scatra"]
    f_sc.setdefault("dirichlet", []).extend([
        DirichletBC(disc.node_sets["xmin"], [1], [2.0]),
        DirichletBC(disc.node_sets["xmax"], [1], [0.2]),
    ])
    res = driver.run(deck)
    state = res.states["sti"]
    f = res.fields["sti"].f
    X = np.asarray(f.scat.disc.coords)
    T = np.asarray(state["T"])
    mid = np.abs(X[:, 0] - 0.5) < 0.06
    assert T[mid].mean() > 0.5 + 1e-3
