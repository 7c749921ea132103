"""Wide-layout (relayout-free) lattice gen-alpha step vs the flat step.

The wide step (physics/solid_lattice.py) must reproduce the flat
gen-alpha trajectory on a uniform lattice: same gen-alpha algebra, same
Newton-Krylov, different data layout (Pallas interpret mode on CPU).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC, NeumannBC
from fourc_tpu.core.functions import FunctionManager
from fourc_tpu.materials import make_material


def _build(n, wide, precond="gmg"):
    from fourc_tpu.physics import solid as ps

    disc = gridgen.box(n, n, n, cell="hex8")
    mat = make_material({"type": "neohooke", "youngs": 1.0e4, "nue": 0.3,
                         "density": 1.0})
    params = ps.SolidParams(
        kinem="nonlinear", dyntype="genalpha",
        genalpha=ps.GenAlphaParams(rho_inf=0.9), precond=precond, wide=wide)
    params.newton.tol_res = 1e-6
    params.newton.tol_disp = 1e-9
    params.newton.combine = "or"
    params.newton.lin_rtol = 1e-6
    fm = FunctionManager()
    fm.add(1, "sin(3.0*t)")
    dbc = [DirichletBC(disc.node_sets["zmin"], [1, 1, 1], [0, 0, 0])]
    neu = [NeumannBC(disc.face_sets["zmax"], [1, 0, 0], [80.0, 0, 0],
                     funct=[1, 0, 0])]
    f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu,
                      functions=fm)
    return f, ps


def test_wide_step_matches_flat_trajectory(monkeypatch):
    # not in the minimal tier: compiles two full Newton step programs with
    # the unrolled XLA-reference lattice stencils (~7 min on CPU)
    monkeypatch.setenv("FOURC_LATTICE", "1")  # lattice fast path on CPU
    n, dt, nsteps = 4, 0.05, 2

    f, ps = _build(n, wide=False)
    state = ps.compute_initial_state(f, ps.init_state(f))
    step = ps.make_step(f, dt=dt)
    for _ in range(nsteps):
        state, stats = step(state)
    assert bool(stats["converged"])
    d_flat = np.asarray(state["d"])

    fw, _ = _build(n, wide=True)
    from fourc_tpu.physics import solid_lattice as sl

    assert sl.eligible(fw)
    sw = ps.compute_initial_state(fw, ps.init_state(fw))
    wstep = ps.make_step(fw, dt=dt)
    for _ in range(nsteps):
        sw, wstats = wstep(sw)
    assert sw["d"].ndim == 4  # ran the wide path
    assert bool(wstats["converged"])
    d_wide = np.asarray(sl.flatten_state(fw, sw)["d"])

    scale = np.abs(d_flat).max()
    assert scale > 1e-6  # the load actually did something
    np.testing.assert_allclose(d_wide, d_flat, rtol=0, atol=5e-4 * scale)
    # velocities/accelerations follow the same newmark algebra
    v_wide = np.asarray(sl.flatten_state(fw, sw)["v"])
    np.testing.assert_allclose(
        v_wide, np.asarray(state["v"]), rtol=0,
        atol=5e-4 * max(np.abs(np.asarray(state["v"])).max(), 1e-9))


def test_wide_step_rayleigh_lumped_matches_flat(monkeypatch):
    """Round-5 fast-path widening: Rayleigh damping + lumped mass run in
    the wide lattice step and reproduce the flat general-path trajectory
    (ref: RAYLEIGH M_DAMP/K_DAMP + LUMPMASS, 4C_inpar_structure.cpp)."""
    n, dt, nsteps = 3, 0.05, 2

    def build(wide, use_lattice):
        monkeypatch.setenv("FOURC_LATTICE", "1" if use_lattice else "0")
        f, ps = _build(n, wide=wide, precond="gmg" if wide else "block_jacobi")
        f.params.rayleigh_alpha = 0.3
        f.params.rayleigh_beta = 0.002
        f.params.mass = "lumped"
        return f, ps

    # flat reference on the general path (plain AD, no lattice kernels)
    f, ps = build(wide=False, use_lattice=False)
    state = ps.compute_initial_state(f, ps.init_state(f))
    step = ps.make_step(f, dt=dt)
    for _ in range(nsteps):
        state, stats = step(state)
    assert bool(stats["converged"])
    d_flat = np.asarray(state["d"])

    fw, _ = build(wide=True, use_lattice=True)
    from fourc_tpu.physics import solid_lattice as sl

    assert sl.eligible(fw), "rayleigh+lumped must be wide-eligible now"
    sw = ps.compute_initial_state(fw, ps.init_state(fw))
    wstep = ps.make_step(fw, dt=dt)
    for _ in range(nsteps):
        sw, wstats = wstep(sw)
    assert sw["d"].ndim == 4  # ran the wide path
    assert bool(wstats["converged"])
    d_wide = np.asarray(sl.flatten_state(fw, sw)["d"])

    scale = np.abs(d_flat).max()
    assert scale > 1e-7
    np.testing.assert_allclose(d_wide, d_flat, rtol=0, atol=5e-4 * scale)


@pytest.mark.minimal
def test_wide_state_roundtrip(monkeypatch):
    monkeypatch.setenv("FOURC_LATTICE", "1")
    f, ps = _build(3, wide=True)
    from fourc_tpu.physics import solid_lattice as sl

    state = ps.init_state(f)
    wide = sl.widen_state(f, state)
    back = sl.flatten_state(f, wide)
    for k in ("d", "v", "a", "fint", "fext"):
        np.testing.assert_allclose(np.asarray(back[k]),
                                   np.asarray(state[k]), atol=0)
