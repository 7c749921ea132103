"""Cardiovascular 0D (Windkessel) - structure coupling tests.

Oracles: (1) divergence-theorem cavity volume of the undeformed box is
exact; (2) with constant inflow Q_in the coupled system approaches the
steady state p = R * Q_in with the cavity inflated against the wall
stiffness; (3) the transient pressure matches the backward-Euler
integration of the scalar Windkessel ODE using the SIMULATED dV/dt
(consistency of the monolithic coupling).
(ref: src/cardiovascular0d — Cardiovascular0DManager + monolithic solver.)
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

R = 2.0
C = 0.5
QIN = 0.3
E_MOD = 500.0


def _deck(numstep, dt):
    return dm.load(f"""
problem: {{type: cardiovascular0d}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  maxiter: 30
  tolres: 1e-9
  toldisp: 1e-10
cardiovascular0d:
  surface: "xmin,xmax,ymin,ymax,zmin,zmax"
  resistance: {R}
  compliance: {C}
  p0: 0.0
  q_in_funct: 1
  timestep: {dt}
  numstep: {numstep}
solver: {{method: gmres, precond: block_jacobi, maxiter: 3000, gmres_restart: 100}}
materials:
  1: {{type: neohooke, youngs: {E_MOD}, nue: 0.3}}
functions:
  1: "{QIN}"
geometry:
  generator:
    - {{kind: box, nx: 3, ny: 3, nz: 3, cell: hex8, mat: 1, name: structure}}
conditions:
  dirichlet:
    - {{nodes: zmin, onoff: [1,1,1], val: [0,0,0]}}
""")


def test_cavity_volume_exact():
    from fourc_tpu.physics import cardio0d_driver as cd
    from fourc_tpu.physics import structure_driver
    import jax.numpy as jnp

    deck = _deck(1, 0.1)
    solid = structure_driver.build_field(deck, "structure")
    f = cd.Cardio0DField(solid, deck.sections["cardiovascular0d"], deck.functions)
    V0 = float(f.volume(jnp.zeros((solid.ndof,))))
    assert V0 == pytest.approx(1.0, abs=1e-9)


def test_windkessel_steady_state():
    res = driver.run(_deck(40, 0.5))  # t -> 20 = 20 RC-ish time constants
    p = float(res.states["cardio0d"]["p0d"])
    assert p == pytest.approx(R * QIN, rel=0.02)
    # cavity inflated: V > 1
    V = float(res.states["cardio0d"]["V"])
    assert V > 1.0001


def test_windkessel_transient_consistency():
    """p_k from the run must satisfy the backward-Euler Windkessel update
    with the run's own volume history — closes the coupling loop."""
    dt, nsteps = 0.25, 8
    ps_, vs = [], []

    def cb(name, state, agg):
        ps_.append(float(state["p0d"]))
        vs.append(float(state["V"]))

    res = driver.run(_deck(nsteps, dt), callbacks=[cb])
    p_prev, V_prev = 0.0, 1.0
    for k in range(nsteps):
        lhs = C * (ps_[k] - p_prev) / dt + ps_[k] / R \
            + (vs[k] - V_prev) / dt - QIN
        assert abs(lhs) < 5e-7
        p_prev, V_prev = ps_[k], vs[k]
