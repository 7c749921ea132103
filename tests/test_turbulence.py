"""LES / turbulence model tests: constant-Smagorinsky eddy viscosity.

Oracle: 2D Taylor-Green vortex on [0,pi]^2 with free-slip walls decays as
E(t) = E0 exp(-4 nu t) for laminar flow.  The Smagorinsky model adds
nu_t = (Cs Delta)^2 |S| > 0, so the LES run must (a) reduce exactly to the
laminar solution when Cs = 0 and (b) dissipate strictly faster when Cs > 0.
(The reference's turbulence module provides the same constant-Smagorinsky
closure, ref: src/fluid_turbulence / fluid_ele turbulence variants.)
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

NU = 0.05
RHO = 1.0
PI = np.pi


def _tg_deck(cs, numstep=10, dt=0.05, n=12):
    return dm.load(f"""
problem: {{type: fluid}}
fluid_dynamic:
  dynamictype: onesteptheta
  theta: 1.0
  timestep: {dt}
  numstep: {numstep}
  tolres: 1e-9
  toldisp: 1e-10
  initialfield_funct: 1
  smagorinsky_cs: {cs}
solver: {{method: gmres, precond: jacobi, maxiter: 4000, gmres_restart: 120}}
materials:
  1: {{type: newtonianfluid, viscosity: {NU * RHO}, density: {RHO}}}
functions:
  1: ["sin(x)*cos(y)", "-cos(x)*sin(y)"]
geometry:
  generator:
    - {{kind: rectangle, nx: {n}, ny: {n}, cell: quad4, mat: 1, name: fluid,
        lo: [0, 0], hi: [{PI}, {PI}]}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,0,0], val: [0,0,0]}}
    - {{nodes: xmax, onoff: [1,0,0], val: [0,0,0]}}
    - {{nodes: ymin, onoff: [0,1,0], val: [0,0,0]}}
    - {{nodes: ymax, onoff: [0,1,0], val: [0,0,0]}}
""")


def _kinetic_energy(res, name="fluid"):
    f = res.fields[name].f
    x = np.asarray(res.states[name]["x"]).reshape(-1, f.ndpn)
    u = x[:, : f.dim]
    return float(0.5 * RHO * np.sum(u**2))


def test_taylor_green_laminar_decay():
    numstep, dt = 10, 0.05
    res = driver.run(_tg_deck(0.0, numstep, dt))
    f = res.fields["fluid"].f
    x = np.asarray(res.states["fluid"]["x"]).reshape(-1, f.ndpn)
    X = np.asarray(f.disc.coords)
    t_end = numstep * dt
    decay = np.exp(-2 * NU * t_end)
    u_ref = np.stack([np.sin(X[:, 0]) * np.cos(X[:, 1]),
                      -np.cos(X[:, 0]) * np.sin(X[:, 1])], axis=1) * decay
    err = np.abs(x[:, :2] - u_ref).max()
    assert err < 0.05  # coarse-mesh transport error budget


def test_smagorinsky_adds_dissipation():
    """nu_t = (Cs Delta)^2 |S| with Delta ~ 0.26, |S| ~ O(1) here, so on
    this coarse mesh the extra decay exp(-4 nu_t t) is percent-level at
    Cs = 0.5 and ~10% at Cs = 1 — both must show up, monotonically."""
    numstep, dt = 10, 0.05
    e_dns = _kinetic_energy(driver.run(_tg_deck(0.0, numstep, dt)))
    e_les = _kinetic_energy(driver.run(_tg_deck(0.5, numstep, dt)))
    e_les_big = _kinetic_energy(driver.run(_tg_deck(1.0, numstep, dt)))
    assert e_les < 0.995 * e_dns
    assert e_les_big < 0.96 * e_dns
    assert e_les_big < e_les  # monotone in Cs


def _tg_dyn_deck(model, numstep=6, dt=0.05, n=12):
    import re

    d = _tg_deck(0.0, numstep, dt, n)
    return d


def test_dynamic_cs2_vanishes_for_smooth_shear():
    """Uniform shear u = (gamma*y, 0): no resolved subgrid activity ->
    Leonard stress ~ 0 -> dynamic Cs^2 ~ 0 (the Germano model's defining
    advantage over constant Cs)."""
    import jax.numpy as jnp

    from fourc_tpu.core import cells, gridgen
    from fourc_tpu.ops import turbulence as tops

    disc = gridgen.rectangle(8, 8, lo=(0, 0), hi=(1, 1), cell="quad4")
    conn = jnp.asarray(np.asarray(disc.blocks["quad4"].conn))
    X = jnp.asarray(disc.coords)
    Xe = X[conn]
    u = jnp.stack([2.0 * X[:, 1], jnp.zeros(X.shape[0])], axis=1)
    cs2 = tops.dynamic_cs2(Xe, u[conn], cells.get_cell("quad4"), conn,
                           disc.n_nodes)
    assert float(jnp.max(cs2)) < 1e-4

    # a marginally-resolved multi-mode field (nonlinear cross-scale
    # transfer) must produce a positive, bounded Cs^2
    k1, k2 = 2 * np.pi * 2, 2 * np.pi * 3
    x, y = X[:, 0], X[:, 1]
    ur = jnp.stack([
        jnp.sin(k1 * x) * jnp.cos(k1 * y)
        + 0.7 * jnp.sin(k2 * x + 0.3) * jnp.cos(k2 * y),
        -jnp.cos(k1 * x) * jnp.sin(k1 * y)
        - 0.7 * jnp.cos(k2 * x + 0.3) * jnp.sin(k2 * y)], axis=1)
    cs2g = tops.dynamic_cs2(Xe, ur[conn], cells.get_cell("quad4"), conn,
                            disc.n_nodes)
    assert 0.0 < float(cs2g[0]) <= 0.09 + 1e-12
    cs2e = tops.dynamic_cs2(Xe, ur[conn], cells.get_cell("quad4"), conn,
                            disc.n_nodes, averaging="element")
    assert 0.0 < float(jnp.max(cs2e)) <= 0.09 + 1e-12


def test_dynamic_smagorinsky_runs_and_bounds_dissipation():
    """Taylor-Green on a coarse mesh: dynamic model adds little dissipation
    (flow is smooth) — kinetic energy stays between the constant-Cs run
    (most dissipative) and close to laminar."""
    numstep, dt = 6, 0.05
    d_lam = _tg_deck(0.0, numstep, dt)
    d_cs = _tg_deck(0.2, numstep, dt)
    d_dyn = _tg_deck(0.0, numstep, dt)
    d_dyn.sections["fluid_dynamic"]["turbulence_model"] = "dynamic_smagorinsky"

    ke_lam = _kinetic_energy(driver.run(d_lam))
    ke_cs = _kinetic_energy(driver.run(d_cs))
    ke_dyn = _kinetic_energy(driver.run(d_dyn))
    assert ke_cs < ke_lam
    assert ke_cs - 1e-12 <= ke_dyn <= ke_lam * 1.001
    # smooth resolved flow: dynamic stays close to laminar
    assert (ke_lam - ke_dyn) < 0.5 * (ke_lam - ke_cs)


# ---------------------------------------------------------------------------
# multifractal SGS + AVM3 (ref: src/fluid_turbulence MFS + avm3_*)
# ---------------------------------------------------------------------------


@pytest.mark.minimal
def test_mfs_b_coefficient_properties():
    """B grows with the element Reynolds number and vanishes at Re <= 1."""
    import jax.numpy as jnp

    from fourc_tpu.core import gridgen
    from fourc_tpu.core.cells import get_cell
    from fourc_tpu.ops import turbulence as tops

    disc = gridgen.rectangle(4, 4, cell="quad4")
    cell = get_cell("quad4")
    conn = jnp.asarray(np.asarray(disc.blocks["quad4"].conn))
    Xe = jnp.asarray(disc.coords)[conn]

    def B_of(umag, nu):
        ue = jnp.ones(Xe.shape) * umag
        B, _ = tops.mfs_fields(Xe, ue, cell, conn, disc.n_nodes, nu)
        return float(B[0])

    assert B_of(1e-6, 1.0) == 0.0  # Re << 1: no cascade, model silent
    b1, b2 = B_of(1.0, 1e-3), B_of(10.0, 1e-3)
    assert 0.0 < b1 < b2


@pytest.mark.minimal
def test_mfs_silent_on_filtered_smooth_field():
    """delta_u = B (u - hat u): a uniform field has u == hat u -> the MFS
    residual contribution is exactly zero."""
    import jax.numpy as jnp

    from fourc_tpu.core import gridgen
    from fourc_tpu.core.cells import get_cell
    from fourc_tpu.ops import turbulence as tops

    disc = gridgen.rectangle(4, 4, cell="quad4")
    cell = get_cell("quad4")
    conn = jnp.asarray(np.asarray(disc.blocks["quad4"].conn))
    Xe = jnp.asarray(disc.coords)[conn]
    ue = jnp.broadcast_to(jnp.array([2.0, 0.5]), Xe.shape)
    B, u_hat = tops.mfs_fields(Xe, ue, cell, conn, disc.n_nodes, 1e-3)
    np.testing.assert_allclose(np.asarray(u_hat[conn]), np.asarray(ue),
                               atol=1e-12)


@pytest.mark.minimal
def test_avm3_scale_separation():
    """(I - P R) annihilates aggregate-constant fields and extracts a
    nonzero fine-scale part from an oscillatory one."""
    import jax.numpy as jnp

    from fourc_tpu.core import gridgen
    from fourc_tpu.ops import turbulence as tops

    disc = gridgen.rectangle(8, 8, cell="quad4")
    agg, counts = tops.avm3_aggregates(disc)
    n = disc.n_nodes
    const = jnp.ones((n, 2))
    fine = tops.avm3_fine_scales(const, agg, counts)
    np.testing.assert_allclose(np.asarray(fine), 0.0, atol=1e-14)
    osc = jnp.asarray(np.random.RandomState(0).randn(n, 2))
    fine = tops.avm3_fine_scales(osc, agg, counts)
    assert float(jnp.abs(fine).max()) > 0.1
    # projection property: separating twice changes nothing
    fine2 = tops.avm3_fine_scales(fine, agg, counts)
    np.testing.assert_allclose(np.asarray(fine2), np.asarray(fine),
                               atol=1e-12)


def test_mfs_and_avm3_decay():
    """Decaying vortex (no forcing): AVM3's fine-scale eddy viscosity is
    strictly dissipative -> faster KE decay than laminar; MFS is active
    and bounded."""
    from fourc_tpu.io import deck as dm
    from fourc_tpu.physics import driver

    def decay(model):
        return dm.load(f"""
problem: {{type: fluid}}
fluid_dynamic:
  dynamictype: onesteptheta
  theta: 1.0
  numstep: 3
  timestep: 0.05
  maxiter: 25
  tolres: 1e-8
  toldisp: 1e-9
  normcombi: or
  turbulence_model: {model}
  smagorinsky_cs: 0.3
  initialfield_funct: 1
solver: {{method: gmres, precond: jacobi, maxiter: 3000, gmres_restart: 120}}
materials:
  1: {{type: newtonianfluid, viscosity: 0.002, density: 1.0}}
functions:
  1: ["sin(3.14159265*x)*cos(3.14159265*y)", "-cos(3.14159265*x)*sin(3.14159265*y)"]
geometry:
  generator: {{kind: rectangle, nx: 10, ny: 10, cell: quad4, mat: 1,
              lo: [0, 0], hi: [1, 1], name: fluid}}
conditions:
  dirichlet:
    - {{nodes: ymax, onoff: [1, 1, 0], val: [0, 0, 0]}}
    - {{nodes: ymin, onoff: [1, 1, 0], val: [0, 0, 0]}}
    - {{nodes: xmin, onoff: [1, 1, 0], val: [0, 0, 0]}}
    - {{nodes: xmax, onoff: [1, 1, 0], val: [0, 0, 0]}}
    - {{nodes: [0], onoff: [0, 0, 1], val: [0, 0, 0]}}
""")

    def ke(model):
        res = driver.run(decay(model))
        x = np.asarray(res.states["fluid"]["x"]).reshape(-1, 3)
        return float((x[:, :2] ** 2).sum())

    ke_lam = ke("none")
    # AVM3 adds a pure fine-scale eddy viscosity: strictly dissipative
    k_avm3 = ke("avm3")
    assert np.isfinite(k_avm3)
    assert k_avm3 < ke_lam, (k_avm3, ke_lam)
    # MFS cross/Reynolds terms are not pointwise dissipative; require the
    # model to be ACTIVE (solution differs) but stable (bounded)
    k_mfs = ke("multifractal")
    assert np.isfinite(k_mfs)
    assert abs(k_mfs - ke_lam) / ke_lam > 1e-5
    assert abs(k_mfs - ke_lam) / ke_lam < 0.15
