"""DEM friction/rolling/adhesion + SPH surface tension & boundary particles.

ref capabilities: src/particle_interaction — DEM tangential & rolling
contact, DEM adhesion, SPH surface tension, boundary-particle treatment.

Oracles:
- a sphere sliding on a frictional floor decelerates at a = mu*g and
  starts spinning (tangential contact torque)
- rolling friction decays the spin of a sphere spinning in place on a floor
- adhesion holds a light particle against gravity on the underside gap
- surface tension pulls a perturbed particle pair together
- boundary particles never move and support a resting fluid column
"""

import jax.numpy as jnp
import numpy as np

from fourc_tpu.particles import engine as pe


def test_dem_sliding_friction_deceleration():
    """Block-on-floor analog: mu*N friction decelerates the slider."""
    mu = 0.3
    g = 100.0
    params = pe.DemParams(k_normal=1e5, damp_normal=50.0, friction_mu=mu,
                          k_tangential=1e4, gravity=(0, 0, -g))
    radii = jnp.array([0.5])
    masses = jnp.array([1.0])
    walls = [((0, 0, 0), (0, 0, 1))]
    step = pe.make_dem_stepper(params, radii, masses, walls, n_sub=20)
    st = pe.init_state(jnp.array([[0.0, 0.0, 0.499]]),
                       jnp.array([[2.0, 0.0, 0.0]]))
    v0 = 2.0
    for _ in range(40):
        st = step(st, 5e-4)
    vx = float(st["v"][0, 0])
    wy = float(st["omega"][0, 1])
    # classic sliding->rolling sphere: friction converts slip to spin until
    # v = omega R, with v_final = 5/7 v0 (independent of mu)
    np.testing.assert_allclose(vx, 5.0 / 7.0 * v0, rtol=0.03)
    np.testing.assert_allclose(wy * 0.5, vx, rtol=0.05)  # rolling: v = w R


def test_dem_rolling_friction_spin_decay():
    params = pe.DemParams(k_normal=1e5, damp_normal=50.0, friction_mu=0.0,
                          rolling_mu=0.2, gravity=(0, 0, -100.0))
    radii = jnp.array([0.5])
    masses = jnp.array([1.0])
    walls = [((0, 0, 0), (0, 0, 1))]
    step = pe.make_dem_stepper(params, radii, masses, walls, n_sub=20)
    st = pe.init_state(jnp.array([[0.0, 0.0, 0.499]]))
    st["omega"] = jnp.array([[0.0, 10.0, 0.0]])
    w0 = 10.0
    for _ in range(10):
        st = step(st, 5e-4)
    w1 = float(st["omega"][0, 1])
    # rolling resistance decays the spin (constant-torque model may
    # overshoot zero by a roundoff-scale amount)
    assert -0.5 < w1 < w0 - 0.5


def test_dem_adhesion_holds_particle():
    """A particle resting against the UNDERSIDE of a ceiling wall (normal
    pointing down) is held by adhesion against gravity."""
    params = pe.DemParams(k_normal=1e5, damp_normal=100.0,
                          adhesion_f0=5.0, adhesion_gap=0.05,
                          gravity=(0, 0, -1.0))  # weight 1.0 < pull-off 5.0
    radii = jnp.array([0.1])
    masses = jnp.array([1.0])
    walls = [((0, 0, 1.0), (0, 0, -1.0))]  # ceiling at z=1, inside is below
    step = pe.make_dem_stepper(params, radii, masses, walls, n_sub=50)
    # start just below touching (gap 0.01 < adhesion_gap)
    st = pe.init_state(jnp.array([[0.0, 0.0, 0.89]]))
    for _ in range(20):
        st = step(st, 2e-4)
    # stuck near the ceiling, not falling
    assert float(st["x"][0, 2]) > 0.85
    assert abs(float(st["v"][0, 2])) < 0.2


def test_sph_surface_tension_pulls_together():
    params = pe.SphParams(h=0.1, rho0=1000.0, c0=20.0, surface_tension=0.0)
    params_st = pe.SphParams(h=0.1, rho0=1000.0, c0=20.0, surface_tension=50.0)
    # two particles at 1.5h separation: pressure force ~0 (low density ->
    # negative Tait pressure is clamped by physics: use small separation
    # inside kernel support), cohesion pulls them together
    x = jnp.array([[0.0, 0.0, 0.0], [0.15, 0.0, 0.0]])
    m = jnp.full((2,), 1.0)
    a0, _, _ = pe.sph_accel(x, jnp.zeros_like(x), m, params)
    a1, _, _ = pe.sph_accel(x, jnp.zeros_like(x), m, params_st)
    # with surface tension, particle 0 is pulled toward +x relative to the
    # tension-free case
    assert float(a1[0, 0] - a0[0, 0]) > 1e-6
    assert float(a1[1, 0] - a0[1, 0]) < -1e-6


def test_sph_boundary_particles_static():
    params = pe.SphParams(h=0.12, rho0=1.0, c0=10.0, gravity=(0, 0, -1.0))
    # floor layer of boundary particles + one fluid particle above
    xs = [[i * 0.1 - 0.2, 0.0, 0.0] for i in range(5)]
    xs.append([0.0, 0.0, 0.09])
    x0 = jnp.asarray(xs)
    bnd = jnp.array([True] * 5 + [False])
    m = jnp.full((6,), 0.01)
    step = pe.make_sph_stepper(params, m, n_sub=20, boundary=bnd)
    st = pe.init_state(x0)
    for _ in range(10):
        st = step(st, 1e-3)
    x = np.asarray(st["x"])
    np.testing.assert_allclose(x[:5], np.asarray(x0)[:5], atol=0.0)  # frozen
    assert x[5, 2] > 0.02  # fluid particle supported above the floor
    assert np.all(np.isfinite(x))
