"""Poroelasticity (Biot) tests: Terzaghi 1D consolidation vs the analytic
series, undrained initial response, and drained steady state.

Oracle analog of the reference's poroelast regression decks
(ref: tests/input_files/poroelast_*.dat; src/poroelast monolithic).

Setup: column 0<=z<=H, load q applied suddenly on top, drained (p=0) at the
top, impermeable elsewhere, laterally confined (1D strain).

  K_c  = lam + 2 mu  (confined modulus; nue=0 -> K_c = E)
  p0   = q alpha / (alpha^2 + S0 K_c)              (undrained response)
  c_v  = (k/mu_f) / (S0 + alpha^2 / K_c)           (consolidation coeff)
  p(z,T)/p0 = sum_m (2/M) sin(M zt/H) exp(-M^2 Tv),
      M = pi(2m+1)/2, zt = H - z (depth below drain), Tv = c_v t / H^2
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

E_MOD = 100.0
Q = 1.0
ALPHA = 1.0
S0 = 0.01
K_OVER_MU = 0.01
H = 1.0

K_C = E_MOD  # nue = 0
P0 = Q * ALPHA / (ALPHA**2 + S0 * K_C)
C_V = K_OVER_MU / (S0 + ALPHA**2 / K_C)


def _deck(numstep, dt, coupling="monolithic", nz=8):
    return dm.load(f"""
problem: {{type: poroelasticity}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  tolres: 1e-9
  toldisp: 1e-10
poro_pressure_dynamic:
  dynamictype: onesteptheta
  theta: 1.0
  tolres: 1e-9
  toldisp: 1e-10
poroelasticity_dynamic:
  coupling: {coupling}
  timestep: {dt}
  numstep: {numstep}
  itemax_outer: 60
  convtol_outer: 1e-7
solver: {{method: gmres, precond: block_jacobi, maxiter: 4000, gmres_restart: 120}}
materials:
  1:
    type: structporo
    youngs: {E_MOD}
    nue: 0.0
    biot_alpha: {ALPHA}
    permeability: {K_OVER_MU}
    viscosity: 1.0
    storage: {S0}
functions:
  1: "1"
geometry:
  generator:
    - {{kind: box, nx: 1, ny: 1, nz: {nz}, cell: hex8, mat: 1, name: structure,
        lo: [0, 0, 0], hi: [0.25, 0.25, {H}]}}
conditions:
  dirichlet:
    - {{nodes: zmin, onoff: [1,1,1], val: [0,0,0]}}
    - {{nodes: xmin, onoff: [1,0,0], val: [0,0,0]}}
    - {{nodes: xmax, onoff: [1,0,0], val: [0,0,0]}}
    - {{nodes: ymin, onoff: [0,1,0], val: [0,0,0]}}
    - {{nodes: ymax, onoff: [0,1,0], val: [0,0,0]}}
    - {{field: pressure, nodes: zmax, onoff: [1], val: [0]}}
  neumann:
    - {{faces: zmax, onoff: [0,0,1], val: [0,0,-{Q}], funct: [0,0,1]}}
""")


def _terzaghi_p(z, t, n_terms=60):
    """Analytic pore pressure at height z (drain at z=H), time t."""
    zt = H - z
    Tv = C_V * t / H**2
    s = 0.0
    for m in range(n_terms):
        M = np.pi * (2 * m + 1) / 2
        s += (2.0 / M) * np.sin(M * zt / H) * np.exp(-(M**2) * Tv)
    return P0 * s


def test_terzaghi_consolidation_monolithic():
    nz = 8
    dt = 0.02
    numstep = 25  # t_end = 0.5 -> Tv = 0.25
    res = driver.run(_deck(numstep, dt, "monolithic", nz=nz))
    f = res.fields["structure"].f
    X = np.asarray(f.disc.coords)
    p = np.asarray(res.states["poro"]["p"])
    t_end = numstep * dt

    # compare p(z) against the series on the column interior
    zs = np.unique(np.round(X[:, 2], 9))
    for z in zs[1:-1]:
        nodes = np.where(np.abs(X[:, 2] - z) < 1e-8)[0]
        p_num = p[nodes].mean()
        p_ref = _terzaghi_p(z, t_end)
        assert p_num == pytest.approx(p_ref, rel=0.08, abs=0.015 * P0), (
            f"z={z}: {p_num} vs {p_ref}")


def test_terzaghi_undrained_start_and_drained_end():
    """First instant: p ~ p0 in the undrained interior; large time: p -> 0
    and settlement -> q H / K_c."""
    dt = 0.004
    res = driver.run(_deck(1, dt, "monolithic"))
    f = res.fields["structure"].f
    X = np.asarray(f.disc.coords)
    p = np.asarray(res.states["poro"]["p"])
    bottom = np.where(X[:, 2] < 1e-8)[0]
    assert p[bottom].mean() == pytest.approx(P0, rel=0.1)

    # long run to (nearly) drained state: Tv = 1.5
    res2 = driver.run(_deck(30, 0.1, "monolithic"))
    p2 = np.asarray(res2.states["poro"]["p"])
    assert np.abs(p2).max() < 0.12 * P0
    d2 = np.asarray(res2.states["poro"]["d"]).reshape(-1, 3)
    top = np.where(np.abs(X[:, 2] - H) < 1e-8)[0]
    assert d2[top, 2].mean() == pytest.approx(-Q * H / K_C, rel=0.1)


def test_poro_partitioned_matches_monolithic():
    r_m = driver.run(_deck(5, 0.05, "monolithic"))
    r_p = driver.run(_deck(5, 0.05, "partitioned"))
    pm = np.asarray(r_m.states["poro"]["p"])
    pp = np.asarray(r_p.states["poro"]["p"])
    dm_ = np.asarray(r_m.states["poro"]["d"])
    dp = np.asarray(r_p.states["poro"]["d"])
    assert np.allclose(pm, pp, atol=1e-4 * P0)
    assert np.allclose(dm_, dp, atol=1e-7)
