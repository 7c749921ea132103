"""Particle (DEM/SPH) tests vs conservation laws and closed forms."""

import numpy as np
import pytest
import jax.numpy as jnp

from fourc_tpu.particles import engine as pe


def test_dem_two_ball_elastic_collision():
    """Head-on equal-mass elastic collision swaps velocities (no damping);
    momentum conserved to machine precision, energy approximately."""
    radii = jnp.asarray([0.1, 0.1])
    masses = jnp.asarray([1.0, 1.0])
    params = pe.DemParams(k_normal=1e5)
    step = pe.make_dem_stepper(params, radii, masses, n_sub=200)
    state = pe.init_state([[0.0, 0, 0], [0.5, 0, 0]], [[1.0, 0, 0], [0.0, 0, 0]])
    dt = 1e-4
    for _ in range(40):
        state = step(state, dt)
    v = np.asarray(state["v"])
    p_total = (np.asarray(masses)[:, None] * v).sum(axis=0)
    assert p_total[0] == pytest.approx(1.0, abs=1e-10)  # momentum
    assert v[0, 0] == pytest.approx(0.0, abs=0.02)  # velocity swap
    assert v[1, 0] == pytest.approx(1.0, abs=0.02)
    e = 0.5 * (np.asarray(masses) * (v**2).sum(axis=1)).sum()
    assert e == pytest.approx(0.5, rel=0.02)  # elastic


def test_dem_ball_settles_on_floor():
    """Static equilibrium on a plane: overlap = m g / k."""
    radii = jnp.asarray([0.1])
    masses = jnp.asarray([2.0])
    g = 10.0
    k = 1e4
    params = pe.DemParams(k_normal=k, damp_normal=20.0, gravity=(0, 0, -g))
    step = pe.make_dem_stepper(params, radii, masses,
                               walls=[((0, 0, 0.0), (0, 0, 1.0))], n_sub=100)
    state = pe.init_state([[0.0, 0.0, 0.12]])
    for _ in range(100):
        state = step(state, 1e-3)
    z = float(state["x"][0, 2])
    overlap = 0.1 - z
    assert overlap == pytest.approx(masses[0] * g / k, rel=1e-3)
    assert abs(float(state["v"][0, 2])) < 1e-6


def test_sph_hydrostatic_density():
    """A uniform lattice at rest has density ~ rho0 when mass = rho0 V."""
    n = 6
    dx = 0.05
    xs = np.stack(np.meshgrid(*[np.arange(n) * dx] * 2, indexing="ij"), -1).reshape(-1, 2)
    params = pe.SphParams(h=1.3 * dx, rho0=1000.0, c0=20.0, gravity=(0, 0))
    masses = jnp.full(xs.shape[0], 1000.0 * dx * dx)
    rho = np.asarray(pe.sph_density(jnp.asarray(xs), masses, params))
    inner = rho[(xs[:, 0] > dx) & (xs[:, 0] < (n - 2) * dx)
                & (xs[:, 1] > dx) & (xs[:, 1] < (n - 2) * dx)]
    assert np.abs(inner / 1000.0 - 1.0).max() < 0.05


def test_sph_momentum_conservation():
    """Pairwise-symmetric forces conserve linear momentum exactly."""
    xs = np.random.RandomState(0).uniform(0, 0.3, (20, 2))
    params = pe.SphParams(h=0.08, rho0=1000.0, c0=20.0, gravity=(0, 0))
    masses = jnp.full(20, 1.0)
    v0 = np.random.RandomState(1).normal(0, 0.1, (20, 2))
    step = pe.make_sph_stepper(params, masses, n_sub=20)
    state = pe.init_state(xs, v0)
    p0 = (np.asarray(masses)[:, None] * v0).sum(axis=0)
    for _ in range(5):
        state = step(state, 1e-4)
    p1 = (np.asarray(masses)[:, None] * np.asarray(state["v"])).sum(axis=0)
    assert np.abs(p1 - p0).max() < 1e-10


def test_gridhash_matches_allpairs_dem():
    """Grid-hash DEM forces == all-pairs forces (cell >= interaction range)."""
    import numpy as np
    import jax.numpy as jnp

    from fourc_tpu.particles import engine as pe
    from fourc_tpu.particles import gridhash as gh

    rng = np.random.default_rng(3)
    N = 200
    x = rng.uniform(0, 2.0, (N, 3))
    v = rng.normal(0, 0.1, (N, 3))
    radii = np.full(N, 0.06)
    params = pe.DemParams(k_normal=1e3, damp_normal=2.0)
    grid = gh.GridHash([0, 0, 0], [2, 2, 2], cell_size=0.15, max_per_cell=16)
    assert grid.occupancy_check(x) <= 16
    f_ap = np.asarray(pe.dem_forces(jnp.asarray(x), jnp.asarray(v),
                                    jnp.asarray(radii), params)[0])
    f_gh = np.asarray(gh.dem_forces_grid(jnp.asarray(x), jnp.asarray(v),
                                         jnp.asarray(radii), params, grid)[0])
    assert np.allclose(f_ap, f_gh, atol=1e-10)


def test_gridhash_matches_allpairs_dem_spin_friction():
    """Grid-hash DEM with Coulomb friction + rolling + spin == all-pairs
    (force AND torque)."""
    import numpy as np
    import jax.numpy as jnp

    from fourc_tpu.particles import engine as pe
    from fourc_tpu.particles import gridhash as gh

    rng = np.random.default_rng(5)
    N = 120
    x = rng.uniform(0, 1.5, (N, 3))
    v = rng.normal(0, 0.1, (N, 3))
    omega = rng.normal(0, 0.5, (N, 3))
    radii = np.full(N, 0.06)
    params = pe.DemParams(k_normal=1e3, damp_normal=2.0, friction_mu=0.4,
                          rolling_mu=0.05, adhesion_f0=0.5, adhesion_gap=0.01)
    grid = gh.GridHash([0, 0, 0], [1.5, 1.5, 1.5], cell_size=0.14,
                       max_per_cell=24)
    assert grid.occupancy_check(x) <= 24
    walls = [((0, 0, 0), (0, 0, 1.0))]
    f_ap, t_ap = pe.dem_forces(jnp.asarray(x), jnp.asarray(v),
                               jnp.asarray(radii), params, walls=walls,
                               omega=jnp.asarray(omega))
    f_gh, t_gh = gh.dem_forces_grid(jnp.asarray(x), jnp.asarray(v),
                                    jnp.asarray(radii), params, grid,
                                    walls=walls, omega=jnp.asarray(omega))
    assert np.allclose(np.asarray(f_ap), np.asarray(f_gh), atol=1e-10)
    assert np.allclose(np.asarray(t_ap), np.asarray(t_gh), atol=1e-10)


def test_gridhash_sph_stepper_matches_allpairs():
    """Grid SPH stepper (with boundary freeze + surface tension) tracks the
    all-pairs stepper trajectory."""
    import numpy as np
    import jax.numpy as jnp

    from fourc_tpu.particles import engine as pe
    from fourc_tpu.particles import gridhash as gh

    rng = np.random.default_rng(7)
    N = 150
    x = rng.uniform(0, 1.0, (N, 3))
    masses = jnp.full((N,), 0.8)
    params = pe.SphParams(h=0.12, rho0=800.0, c0=20.0,
                          surface_tension=0.05, gravity=(0, 0, -9.81))
    boundary = np.zeros(N, bool)
    boundary[:20] = True
    grid = gh.GridHash([-0.5, -0.5, -0.5], [1.5, 1.5, 1.5],
                       cell_size=2 * params.h, max_per_cell=48)
    assert grid.occupancy_check(x) <= 48
    s0 = pe.init_state(x)
    step_ap = pe.make_sph_stepper(params, masses, n_sub=2, boundary=boundary)
    step_gh = gh.make_sph_stepper_grid(params, masses, grid, n_sub=2,
                                       boundary=boundary)
    s_ap = step_ap(s0, 1e-3)
    s_gh = step_gh(s0, 1e-3)
    assert np.allclose(np.asarray(s_ap["x"]), np.asarray(s_gh["x"]),
                       atol=1e-9)
    assert np.allclose(np.asarray(s_ap["v"]), np.asarray(s_gh["v"]),
                       atol=1e-8)


def test_gridhash_matches_allpairs_sph():
    import numpy as np
    import jax.numpy as jnp

    from fourc_tpu.particles import engine as pe
    from fourc_tpu.particles import gridhash as gh

    rng = np.random.default_rng(7)
    N = 150
    x = rng.uniform(0, 1.0, (N, 3))
    v = rng.normal(0, 0.05, (N, 3))
    masses = np.full(N, 0.01)
    params = pe.SphParams(h=0.12, rho0=1000.0, c0=10.0)
    grid = gh.GridHash([0, 0, 0], [1, 1, 1], cell_size=2 * params.h,
                       max_per_cell=48)
    assert grid.occupancy_check(x) <= 48
    rho_ap = np.asarray(pe.sph_density(jnp.asarray(x), jnp.asarray(masses), params))
    rho_gh = np.asarray(gh.sph_density_grid(jnp.asarray(x), jnp.asarray(masses),
                                            params, grid))
    assert np.allclose(rho_ap, rho_gh, rtol=1e-12)
    a_ap, _, _ = pe.sph_accel(jnp.asarray(x), jnp.asarray(v), jnp.asarray(masses), params)
    a_gh, _, _ = gh.sph_accel_grid(jnp.asarray(x), jnp.asarray(v),
                                   jnp.asarray(masses), params, grid)
    assert np.allclose(np.asarray(a_ap), np.asarray(a_gh), atol=1e-9)


def test_rigid_body_dumbbell_rotation():
    """A rigid 2-particle dumbbell with initial spin rotates rigidly:
    inter-particle distance preserved, angular speed constant (free body,
    principal-axis rotation) — ref: src/particle_rigidbody semantics."""
    import jax.numpy as jnp

    from fourc_tpu.particles.engine import RigidBodies

    x0 = np.array([[-0.5, 0, 0], [0.5, 0, 0]])
    m = np.array([1.0, 1.0])
    rb = RigidBodies(x0, m, body_of=np.array([0, 0]), n_bodies=1)
    bs = rb.init_state(com0=np.array([[0.0, 0, 0]]))
    bs = dict(bs, omega=jnp.asarray([[0.0, 0.0, 2.0]]))

    x = jnp.asarray(x0)
    v = jnp.zeros_like(x)
    dt = 1e-3
    for _ in range(500):  # t = 0.5, rotation angle 1 rad
        F = jnp.zeros((1, 3))
        tau = jnp.zeros((1, 3))
        bs = rb.step(bs, F, tau, dt)
        x, v = rb.slave_particles(bs, x, v)
    d = float(jnp.linalg.norm(x[1] - x[0]))
    assert abs(d - 1.0) < 1e-10  # rigid
    ang = np.arctan2(float(x[1, 1]), float(x[1, 0]))
    assert abs(ang - 1.0) < 1e-6  # omega * t = 2 * 0.5
    assert abs(float(jnp.linalg.norm(bs["omega"])) - 2.0) < 1e-10


def test_rigid_body_force_reduction_and_torque():
    """Equal+opposite forces on the dumbbell ends produce pure torque; a
    common force produces pure COM acceleration."""
    import jax.numpy as jnp

    from fourc_tpu.particles.engine import RigidBodies

    x0 = np.array([[-0.5, 0, 0], [0.5, 0, 0]])
    rb = RigidBodies(x0, np.array([1.0, 1.0]), np.array([0, 0]), 1)
    x = jnp.asarray(x0)
    F, tau = rb.reduce_forces(x, jnp.asarray([[0, -1.0, 0], [0, 1.0, 0]]))
    assert np.allclose(F, 0.0, atol=1e-12)
    assert np.allclose(tau, [[0, 0, 1.0]], atol=1e-12)  # r x f = 0.5+0.5
    F2, tau2 = rb.reduce_forces(x, jnp.asarray([[0, 2.0, 0], [0, 2.0, 0]]))
    assert np.allclose(F2, [[0, 4.0, 0]], atol=1e-12)
    assert np.allclose(tau2, 0.0, atol=1e-12)


def test_sph_open_boundary_recycles_channel_flow():
    """OpenBoundary (ADVICE r2): particles crossing the outflow plane are
    recycled to the inflow side with the prescribed inflow velocity and the
    particle count is conserved (fixed-capacity budget)."""
    import jax.numpy as jnp

    n = 12
    xs = np.zeros((n, 2))
    xs[:, 0] = np.linspace(0.02, 0.98, n)   # spread along the channel
    xs[:, 1] = 0.5
    v0 = np.zeros((n, 2))
    v0[:, 0] = 2.0  # uniform advection toward the outflow plane
    params = pe.SphParams(h=0.04, rho0=1000.0, c0=1e-4, alpha_visc=0.0,
                          gravity=(0, 0))  # c0->0: pressure-free advection
    masses = jnp.full(n, 1000.0 * 0.08**2)
    ob = pe.OpenBoundary(axis=0, x_in=0.0, x_out=1.0, v_in=(2.0, 0.0))
    step = pe.make_sph_stepper(params, masses, n_sub=1, open_bc=ob)
    state = pe.init_state(xs, v0)
    for _ in range(40):
        state = step(state, 1e-2)
    x = np.asarray(state["x"])
    v = np.asarray(state["v"])
    assert x.shape[0] == n  # count conserved
    assert (x[:, 0] <= 1.0 + 1e-12).all()  # nobody past the outflow plane
    # everyone was recycled at least once (travel 0.8 > shortest gap) and
    # carries the inflow velocity
    np.testing.assert_allclose(v[:, 0], 2.0, atol=1e-3)


def test_sph_open_boundary_dim_mismatch_raises():
    """A 2-component v_in with a 3D particle state must raise, not
    broadcast garbage (ADVICE r2)."""
    import jax.numpy as jnp

    xs = np.random.RandomState(0).uniform(0, 1, (4, 3))
    params = pe.SphParams(h=0.2, gravity=(0, 0, 0))
    masses = jnp.full(4, 1.0)
    ob = pe.OpenBoundary(axis=0, v_in=(1.0, 0.0))  # 2 comps, 3D state
    step = pe.make_sph_stepper(params, masses, open_bc=ob)
    state = pe.init_state(xs, np.zeros((4, 3)))
    with pytest.raises(ValueError, match="components"):
        step(state, 1e-3)
