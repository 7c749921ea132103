"""Electrochemistry (Nernst-Planck + ENC) tests.

Oracle: a binary z = +/-1 electrolyte under electroneutrality behaves as a
single neutral salt diffusing with the ambipolar coefficient

    D_salt = 2 D+ D- / (D+ + D-)

and develops the junction (diffusion) potential

    phi(x) - phi(ref) = -(RT/F) * (D+ - D-)/(D+ + D-) * ln(c(x)/c(ref)).

(Classic Nernst-Planck results; the reference's elch regression decks test
the same physics, ref: tests/input_files/elch_*.dat, src/scatra_ele/
4C_scatra_ele_calc_elch_NP.*.)  The numerical salt profile is checked
against the SAME discretization solving plain diffusion with D_salt via the
existing scatra solver — a partition of the physics, not of the mesh.
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

DP = 2.0
DN = 0.5
D_SALT = 2 * DP * DN / (DP + DN)  # 0.8
C0 = 1.0
CL = 2.0  # left boundary salt concentration
FRT = 96485.3329 / (8.314462 * 298.0)


def _elch_deck(numstep, dt, nx=16):
    return dm.load(f"""
problem: {{type: elch}}
scatra_dynamic:
  dynamictype: onesteptheta
  theta: 1.0
  timestep: {dt}
  numstep: {numstep}
  tolres: 1e-10
  toldisp: 1e-12
  maxiter: 20
solver: {{method: gmres, precond: jacobi, maxiter: 2000, gmres_restart: 100}}
materials:
  1:
    type: elchmat
    species:
      - {{valence: 1, diffusivity: {DP}, c0: {C0}}}
      - {{valence: -1, diffusivity: {DN}, c0: {C0}}}
functions:
  1: "1"
geometry:
  generator:
    - {{kind: rectangle, nx: {nx}, ny: 1, cell: quad4, mat: 1, name: elch,
        lo: [0, 0], hi: [1, 0.1]}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1,1], val: [{CL},{CL},0]}}
""")


def _salt_deck(numstep, dt, nx=16):
    return dm.load(f"""
problem: {{type: scatra}}
scatra_dynamic:
  dynamictype: onesteptheta
  theta: 1.0
  timestep: {dt}
  numstep: {numstep}
  tolres: 1e-10
  toldisp: 1e-12
solver: {{method: cg, precond: jacobi, maxiter: 2000}}
materials:
  1: {{type: scatra, diffusivity: {D_SALT}}}
functions:
  1: "1"
geometry:
  generator:
    - {{kind: rectangle, nx: {nx}, ny: 1, cell: quad4, mat: 1, name: scatra,
        lo: [0, 0], hi: [1, 0.1]}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1], val: [{CL}]}}
""")


def test_binary_electrolyte_ambipolar_diffusion():
    numstep, dt = 10, 0.005
    res = driver.run(_elch_deck(numstep, dt))
    f = res.fields["elch"].f
    y = np.asarray(res.states["elch"]["y"]).reshape(-1, 3)
    cp, cn, phi = y[:, 0], y[:, 1], y[:, 2]

    # electroneutrality: c+ = c- pointwise
    assert np.allclose(cp, cn, rtol=0, atol=1e-8 * CL)

    # salt profile matches single-species diffusion with D_salt
    # (scatra run starts from phi=0; elch starts from c0 -> offset the IC)
    ref = driver.run(_salt_deck(numstep, dt))
    c_ref = np.asarray(ref.states["scatra"]["phi"]) + 0.0
    # scatra initial condition is 0 with boundary CL; elch starts at C0 with
    # boundary CL: both solve the same linear heat equation, so
    # c_elch = C0 + (c_ref/CL) * (CL - C0) by linearity
    c_expect = C0 + (c_ref / CL) * (CL - C0)
    assert np.allclose(cp, c_expect, rtol=0, atol=6e-3 * CL)


def test_binary_electrolyte_junction_potential():
    numstep, dt = 10, 0.005
    res = driver.run(_elch_deck(numstep, dt))
    y = np.asarray(res.states["elch"]["y"]).reshape(-1, 3)
    cp, phi = y[:, 0], y[:, 2]
    f = res.fields["elch"].f
    X = np.asarray(f.disc.coords)
    # junction potential: phi = -(1/frt) (D+-D-)/(D++D-) ln c + const,
    # referenced to the x=0 boundary (phi=0, c=CL)
    interior = np.where((X[:, 0] > 0.05) & (X[:, 0] < 0.7))[0]
    beta = (DP - DN) / (DP + DN)
    phi_ref = -(1.0 / FRT) * beta * np.log(cp[interior] / CL)
    assert np.allclose(phi[interior], phi_ref, rtol=0.0,
                       atol=0.08 * np.abs(phi_ref).max())


def test_butler_volmer_electrode_kinetics():
    """Two-electrode cell (anode x=1 at V=0.2, cathode x=0 at V=0):
    Butler-Volmer interfaces drive a current; the transported cation
    polarizes (accumulates at the anode side where it is injected),
    electroneutrality holds in the bulk, and the two electrode currents
    balance at steady state (ref: 4C_scatra_ele_boundary_calc_elch_electrode.*).

    Scaled units: F = R = T = 1 -> frt = 1.
    """
    deck = dm.load("""
problem: {type: elch}
scatra_dynamic: {dynamictype: onesteptheta, theta: 1.0, timestep: 0.05,
                 numstep: 30, maxiter: 12, tolres: 1e-10, toldisp: 1e-10,
                 normcombi: or}
solver: {method: gmres, precond: jacobi, maxiter: 3000, rtol: 1e-10,
         gmres_restart: 100}
functions:
  1: "0.2"
  2: "0.0"
materials:
  1: {type: elchmat, temperature: 1.0, faraday: 1.0, gas_constant: 1.0,
      species: [{valence: 1.0, diffusivity: 1.0, c0: 1.0},
                {valence: -1.0, diffusivity: 1.0, c0: 1.0}]}
geometry:
  generator: {kind: rectangle, nx: 10, ny: 2, cell: quad4, mat: 1,
              lo: [0, 0], hi: [1, 0.2], name: elch}
conditions:
  electrode_kinetics:
    - {faces: xmax, species: 1, i0: 0.5, alpha_a: 0.5, alpha_c: 0.5,
       e0: 0.0, v_funct: 1}
    - {faces: xmin, species: 1, i0: 0.5, alpha_a: 0.5, alpha_c: 0.5,
       e0: 0.0, v_funct: 2}
""")
    res = driver.run(deck)
    f = res.fields["elch"].f
    y = np.asarray(res.states["elch"]["y"]).reshape(-1, f.ndpn)
    X = np.asarray(f.disc.coords)
    c1, c2, phi = y[:, 0], y[:, 1], y[:, 2]

    # cation injected at the anode (x=1), consumed at the cathode (x=0)
    c1_an = c1[np.isclose(X[:, 0], 1.0)].mean()
    c1_ca = c1[np.isclose(X[:, 0], 0.0)].mean()
    assert c1_an > 1.0 + 1e-3
    assert c1_ca < 1.0 - 1e-3
    # electroneutrality: z1 c1 + z2 c2 = 0 -> c1 = c2
    assert np.abs(c1 - c2).max() < 1e-6 * np.abs(c1).max()
    # potential drops from anode to cathode side (current flows +x to -x
    # inside the electrolyte? sign: higher phi near the anode)
    phi_an = phi[np.isclose(X[:, 0], 1.0)].mean()
    phi_ca = phi[np.isclose(X[:, 0], 0.0)].mean()
    assert phi_an > phi_ca
