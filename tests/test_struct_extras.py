"""Truss / torsion-spring / rigid-sphere elements + Brownian dynamics.

Counterpart of the reference's small structural element tests (ref:
src/truss3, src/torsion3, src/rigidsphere regression decks) and the
browniandyn statistical behavior (ref: src/browniandyn).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourc_tpu.core.conditions import DirichletBC, PointNeumannBC
from fourc_tpu.core.mesh import Discretization
from fourc_tpu.materials import make_material
from fourc_tpu.physics import beam as pb
from fourc_tpu.physics import solid as ps


def _line_disc(coords, conn, cell="line2", name="structure"):
    d = Discretization(name=name, coords=np.asarray(coords, float))
    d.add_block(cell, np.asarray(conn, np.int32), mat_id=1)
    return d


def _params(**kw):
    p = ps.SolidParams(dyntype="statics", **kw)
    p.newton.tol_res = 1e-12
    p.newton.tol_disp = 1e-13
    p.newton.lin_rtol = 1e-12
    p.newton.max_iter = 40
    p.newton.lin_maxiter = 500
    return p


def test_truss_axial_nonlinear():
    """Green-strain truss under axial end load: EA*eps*lambda = P with
    eps = (lambda^2 - 1)/2 — compare against the root of the cubic."""
    E, A, L, P = 1000.0, 0.01, 2.0, 4.0
    disc = _line_disc([[0, 0, 0], [L, 0, 0]], [[0, 1]])
    mat = make_material({"type": "truss", "youngs": E, "area": A})
    dbc = [DirichletBC(np.array([0]), [1, 1, 1, 1, 1, 1], [0] * 6),
           DirichletBC(np.array([1]), [0, 1, 1, 1, 1, 1], [0] * 6)]
    neu = [PointNeumannBC(np.array([1]), [1, 0, 0, 0, 0, 0],
                          [P, 0, 0, 0, 0, 0])]
    f = pb.BeamField(disc, {1: mat}, _params(), dirichlet=dbc,
                     point_neumann=neu)
    state = pb.init_state(f)
    step = pb.make_step(f, dt=1.0)
    state, stats = step(state)
    assert bool(stats["converged"])
    # EA/2 (lam^3 - lam) = P
    lam = np.roots([E * A / 2, 0, -E * A / 2, -P])
    lam = float(lam[np.isreal(lam) & (lam.real > 0)].real.max())
    u_want = (lam - 1.0) * L
    u_got = float(np.asarray(state["d"]).reshape(-1, 6)[1, 0])
    np.testing.assert_allclose(u_got, u_want, rtol=1e-8)


def test_torsion_spring_restoring_moment():
    """Bent 3-node chain: quadratic spring's nodal force is the exact
    gradient of k/2 theta^2 (checked against finite differences) and
    vanishes for the straight chain."""
    from fourc_tpu.ops import truss as tops

    k = 5.0
    Xe = jnp.asarray([[[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]]])
    ue = jnp.zeros((1, 3, 3))
    f0 = tops.torsion_force(Xe, ue, k)
    np.testing.assert_allclose(np.asarray(f0), 0.0, atol=1e-12)
    # bend node 2 up by small dy: theta ~ dy, restoring tip force ~ -k dy
    dy = 1e-3
    ue = ue.at[0, 2, 1].set(dy)
    en = tops.torsion_energy(Xe, ue, k)
    np.testing.assert_allclose(float(en[0]), 0.5 * k * dy * dy, rtol=1e-5)
    fan = tops.torsion_force(Xe, ue, k)
    # finite-difference check of the AD gradient
    eps = 1e-7
    for n in range(3):
        for c in range(3):
            up = ue.at[0, n, c].add(eps)
            um = ue.at[0, n, c].add(-eps)
            fd = (float(tops.torsion_energy(Xe, up, k)[0])
                  - float(tops.torsion_energy(Xe, um, k)[0])) / (2 * eps)
            np.testing.assert_allclose(float(fan[0, n, c]), fd, atol=1e-6)


def test_torsion_spring_statics_equilibrium():
    """Chain with a torsion spring + trusses relaxes toward straight when
    the tip load is removed after a perturbation (statics: the spring's
    only equilibrium with free tip is theta = 0)."""
    k, E, A = 2.0, 1e4, 1.0
    coords = [[0, 0, 0], [1, 0, 0], [2, 0.3, 0]]
    d = Discretization(name="structure", coords=np.asarray(coords, float))
    d.add_block("line2", np.asarray([[0, 1], [1, 2]], np.int32), mat_id=1)
    d.add_block("line3", np.asarray([[0, 1, 2]], np.int32), mat_id=2)
    mats = {1: make_material({"type": "truss", "youngs": E, "area": A}),
            2: make_material({"type": "torsion_spring", "stiffness": k})}
    dbc = [DirichletBC(np.array([0]), [1, 1, 1, 1, 1, 1], [0] * 6),
           DirichletBC(np.array([1]), [1, 1, 1, 1, 1, 1], [0] * 6),
           DirichletBC(np.array([2]), [0, 0, 1, 1, 1, 1], [0] * 6)]
    f = pb.BeamField(d, mats, _params(), dirichlet=dbc)
    state = pb.init_state(f)
    step = pb.make_step(f, dt=1.0)
    state, stats = step(state)
    assert bool(stats["converged"])
    # tip returns to the straight configuration (y -> -0.3 displacement)
    u2 = np.asarray(state["d"]).reshape(-1, 6)[2]
    np.testing.assert_allclose(u2[1], -0.3, atol=1e-4)


def test_rigidsphere_mass_and_drag():
    from fourc_tpu.ops import truss as tops

    r, rho, eta = 0.5, 2.0, 3.0
    m, inertia = tops.sphere_mass(r, rho)
    np.testing.assert_allclose(m, rho * 4 / 3 * np.pi * r**3)
    np.testing.assert_allclose(inertia, 0.4 * m * r * r)
    gt, gr = tops.sphere_drag(r, eta)
    np.testing.assert_allclose(gt, 6 * np.pi * eta * r)
    np.testing.assert_allclose(gr, 8 * np.pi * eta * r**3)
    # field-level lumped mass
    disc = _line_disc([[0, 0, 0]], [[0]], cell="point1")
    mat = make_material({"type": "rigidsphere", "radius": r, "density": rho})
    f = pb.BeamField(disc, {1: mat}, _params())
    ml = np.asarray(f.lumped_mass()).reshape(-1, 6)
    np.testing.assert_allclose(ml[0, :3], m)
    np.testing.assert_allclose(ml[0, 3:], inertia)


def test_brownian_sphere_diffusion():
    """Free rigid spheres: MSD = 6 D t with D = kT / (6 pi eta r)
    (Einstein relation) — the defining statistical check of Brownian
    dynamics (ref: browniandyn free-diffusion behavior)."""
    from fourc_tpu.physics import browniandyn as bd

    n, r, eta, kt, dt, nstep = 400, 0.3, 1.2, 2.0, 0.05, 100
    coords = np.zeros((n, 3))
    conn = np.arange(n, dtype=np.int32)[:, None]
    disc = _line_disc(coords, conn, cell="point1")
    mat = make_material({"type": "rigidsphere", "radius": r, "density": 1.0})
    params = _params()
    params.newton.max_iter = 3  # linear problem: drag only
    f = pb.BeamField(disc, {1: mat}, params)
    bp = bd.BrownianParams(kt=kt, viscosity=eta, seed=3)
    final, traj = bd.run(f, bp, dt=dt, numstep=nstep)
    d = np.asarray(traj[-1]).reshape(-1, 6)[:, :3]
    msd = float((d**2).sum(axis=1).mean())
    D = kt / (6 * np.pi * eta * r)
    want = 6 * D * nstep * dt
    assert abs(msd - want) / want < 0.2  # 400 samples: ~10% stderr


def test_brownian_relaxation_deterministic():
    """kT = 0: overdamped relaxation of a stretched truss decays toward
    equilibrium monotonically with rate EA/(L gamma_node)."""
    from fourc_tpu.physics import browniandyn as bd

    E, A, L = 10.0, 1.0, 1.0
    disc = _line_disc([[0, 0, 0], [L, 0, 0]], [[0, 1]])
    mat = make_material({"type": "truss", "youngs": E, "area": A})
    dbc = [DirichletBC(np.array([0]), [1, 1, 1, 1, 1, 1], [0] * 6),
           DirichletBC(np.array([1]), [0, 1, 1, 1, 1, 1], [0] * 6)]
    f = pb.BeamField(disc, {1: mat}, _params(), dirichlet=dbc)
    bp = bd.BrownianParams(kt=0.0, damping_coeff=4.0)
    state = bd.init_state(f, bp)
    u0 = 0.05
    state["d"] = state["d"].at[6].set(u0)  # stretch node 1 in x
    final, traj = bd.run(f, bp, dt=0.01, numstep=50, state=state)
    ux = np.asarray(traj).reshape(50, -1)[:, 6]
    assert np.all(np.diff(ux) < 0) and ux[-1] < 0.2 * u0
    # linearized decay rate: gamma_node du/dt = -EA/L u
    gam = 0.5 * 4.0 * L
    tau = gam * L / (E * A)
    t = 0.01 * np.arange(1, 51)
    want = u0 * np.exp(-t / tau)
    np.testing.assert_allclose(ux, want, rtol=0.12)
