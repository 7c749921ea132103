"""Scalar transport (scatra/thermo) tests vs analytic solutions.

Mirrors the reference's deck-driven regression strategy (RESULT DESCRIPTION
values, ref: tests/input_files/scatra_*.dat) with analytic oracles.
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.io.result_test import assert_result_tests
from fourc_tpu.physics import driver


def _phi(res, name="scatra"):
    return np.asarray(res.states[name]["phi"])


def test_steady_diffusion_linear_profile():
    """-D phi'' = 0, phi(0)=0, phi(1)=1 -> phi = x."""
    deck = dm.load(
        """
problem: {type: scatra}
scatra_dynamic: {dynamictype: stationary, numstep: 1}
solver: {method: cg, precond: jacobi, maxiter: 500}
materials:
  1: {type: scatra, diffusivity: 2.5}
geometry:
  generator: {kind: box, nx: 4, ny: 2, nz: 2, cell: hex8, mat: 1, name: scatra}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1], val: [0.0]}
    - {nodes: xmax, onoff: [1], val: [1.0]}
"""
    )
    res = driver.run(deck)
    f = res.fields["scatra"].f
    x = f.disc.coords[:, 0]
    assert np.abs(_phi(res) - x).max() < 1e-8


def test_steady_source_parabola():
    """-D phi'' = s, phi(0)=phi(1)=0 -> phi = s x(1-x)/(2D)."""
    deck = dm.load(
        """
problem: {type: scatra}
scatra_dynamic: {dynamictype: stationary, numstep: 1}
solver: {method: cg, precond: jacobi}
materials:
  1: {type: scatra, diffusivity: 0.5}
geometry:
  generator: {kind: box, nx: 16, ny: 1, nz: 1, cell: hex8, mat: 1, name: scatra}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1], val: [0.0]}
    - {nodes: xmax, onoff: [1], val: [0.0]}
  body_force:
    - {val: [3.0]}
"""
    )
    res = driver.run(deck)
    f = res.fields["scatra"].f
    x = f.disc.coords[:, 0]
    exact = 3.0 * x * (1 - x) / (2 * 0.5)
    assert np.abs(_phi(res) - exact).max() < 5e-3


def test_steady_advection_diffusion_exponential():
    """u phi' = D phi'': phi = (e^(ux/D)-1)/(e^(u/D)-1); Pe_h = 0.5."""
    u, D = 2.0, 0.25
    deck = dm.load(
        f"""
problem: {{type: scatra}}
scatra_dynamic:
  dynamictype: stationary
  numstep: 1
  velocity: ["{u}", "0", "0"]
  stab: taylor
solver: {{method: bicgstab, precond: jacobi}}
materials:
  1: {{type: scatra, diffusivity: {D}}}
geometry:
  generator: {{kind: box, nx: 16, ny: 1, nz: 1, cell: hex8, mat: 1, name: scatra}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1], val: [0.0]}}
    - {{nodes: xmax, onoff: [1], val: [1.0]}}
"""
    )
    res = driver.run(deck)
    f = res.fields["scatra"].f
    x = f.disc.coords[:, 0]
    exact = (np.exp(u * x / D) - 1) / (np.exp(u / D) - 1)
    assert np.abs(_phi(res) - exact).max() < 2e-2


@pytest.mark.parametrize("scheme,tol", [("onesteptheta", 2e-4), ("bdf2", 2e-4), ("genalpha", 2e-3)])
def test_transient_reaction_decay(scheme, tol):
    """d phi/dt = -k phi, uniform field -> exp(-k t) (scheme accuracy)."""
    k, T = 3.0, 0.5
    deck = dm.load(
        f"""
problem: {{type: scatra}}
scatra_dynamic:
  dynamictype: {scheme}
  timestep: 0.0125
  numstep: 40
  theta: 0.5
  rho_inf: 0.8
  initialfield_funct: 1
solver: {{method: cg, precond: jacobi}}
materials:
  1: {{type: scatra, diffusivity: 1.0, reacoeff: {k}}}
functions:
  1: "1"
geometry:
  generator: {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1, name: scatra}}
conditions: {{}}
"""
    )
    res = driver.run(deck)
    exact = np.exp(-k * T)
    assert np.abs(_phi(res) - exact).max() < tol


def test_transient_conduction_thermo_series():
    """Slab cooling: T(x,0)=sin(pi x), T(0)=T(1)=0 -> exp(-alpha pi^2 t) sin(pi x).

    Thermo field: rho c dT/dt = k T'' with alpha = k/(rho c).
    """
    k, rho, cp = 0.5, 2.0, 3.0
    alpha = k / (rho * cp)
    T_end = 0.4
    deck = dm.load(
        f"""
problem: {{type: thermo}}
thermal_dynamic:
  dynamictype: onesteptheta
  theta: 0.5
  timestep: 0.01
  numstep: 40
  initialfield_funct: 1
solver: {{method: cg, precond: jacobi}}
materials:
  1: {{type: fourier, conductivity: {k}, capacity: {cp}, density: {rho}}}
functions:
  1: "sin(pi*x)"
geometry:
  generator: {{kind: box, nx: 10, ny: 1, nz: 1, cell: hex8, mat: 1, name: thermo}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1], val: [0.0]}}
    - {{nodes: xmax, onoff: [1], val: [0.0]}}
"""
    )
    res = driver.run(deck)
    f = res.fields["thermo"].f
    x = f.disc.coords[:, 0]
    exact = np.exp(-alpha * np.pi**2 * T_end) * np.sin(np.pi * x)
    # coarse mesh: semi-discrete decay rate differs O(h^2) from pi^2
    assert np.abs(_phi(res, "thermo") - exact).max() < 2e-2


def test_scatra_result_description_and_neumann_flux():
    """Steady conduction with flux BC: -D phi' = -q at x=1 -> phi = q x / D."""
    deck = dm.load(
        """
problem: {type: scatra}
scatra_dynamic: {dynamictype: stationary, numstep: 1}
solver: {method: cg, precond: jacobi}
materials:
  1: {type: scatra, diffusivity: 2.0}
geometry:
  generator: {kind: box, nx: 4, ny: 1, nz: 1, cell: hex8, mat: 1, name: scatra}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1], val: [0.0]}
  neumann:
    - {faces: xmax, onoff: [1], val: [4.0]}
result_description:
  - {field: scatra, node: 4, quantity: phi, value: 0.5, tolerance: 1e-8}
  - {field: scatra, node: 16, quantity: phi, value: 2.0, tolerance: 1e-8}
"""
    )
    res = driver.run(deck)
    assert_result_tests(deck.result_tests, res)
    f = res.fields["scatra"].f
    x = f.disc.coords[:, 0]
    assert np.abs(_phi(res) - 2.0 * x).max() < 1e-8
