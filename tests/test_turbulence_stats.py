"""Turbulence statistics (running moments + plane averaging) tests.

Oracles (ref capability: src/fluid_turbulence statistics manager):
- the in-jit accumulator reproduces exact time mean / variance /
  covariance of a synthetic alternating field;
- plane averaging over a homogeneous direction groups nodes exactly;
- sampling through the fluid driver on a steady Poiseuille-like flow
  gives mean == instantaneous and (near-)zero Reynolds stresses.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fourc_tpu.physics import turbulence_stats as ts

pytestmark = pytest.mark.minimal


def test_accumulator_exact_moments():
    n, d = 5, 3
    rng = np.random.default_rng(3)
    samples = rng.normal(size=(12, n, d + 1))  # (u(3), p) per node
    st = ts.init_stats(n, d, jnp.float64)
    for s in samples:
        st = ts.accumulate(st, jnp.asarray(s.reshape(-1)), d + 1)
    out = ts.finalize(st)
    u = samples[..., :d]
    p = samples[..., d]
    np.testing.assert_allclose(out["mean_u"], u.mean(0), rtol=1e-12)
    np.testing.assert_allclose(out["mean_p"], p.mean(0), rtol=1e-12)
    # Reynolds stresses = population covariance of the samples
    for k, (i, j) in enumerate(((0, 0), (1, 1), (2, 2), (0, 1), (0, 2),
                                (1, 2))):
        cov = (u[:, :, i] * u[:, :, j]).mean(0) - u[:, :, i].mean(0) * u[
            :, :, j].mean(0)
        np.testing.assert_allclose(out["re_stress"][:, k], cov, atol=1e-12)
    np.testing.assert_allclose(out["p_var"], p.var(0), atol=1e-12)


def test_sampling_start_weight_gates():
    st = ts.init_stats(2, 2, jnp.float64)
    x1 = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    st = ts.accumulate(st, 10 * x1, 3, weight=0.0)  # pre-sampling washout
    st = ts.accumulate(st, x1, 3, weight=1.0)
    out = ts.finalize(st)
    assert out["n_samples"] == 1.0
    np.testing.assert_allclose(out["mean_u"], [[1.0, 2.0], [4.0, 5.0]])


def test_plane_profiles_grouping():
    # 3 x-columns x 2 y-rows; average over x (homogeneous) -> y profile
    coords = np.array([[x, y] for y in (0.0, 1.0) for x in (0.0, 0.5, 1.0)])
    vals = np.array([1.0, 2.0, 3.0, 10.0, 20.0, 30.0])
    pos, prof = ts.plane_profiles(coords, {"v": vals}, axis=1)
    np.testing.assert_allclose(pos, [0.0, 1.0])
    np.testing.assert_allclose(prof["v"], [2.0, 20.0])


def test_fluid_driver_steady_flow_statistics():
    from fourc_tpu.io import deck as dm
    from fourc_tpu.physics import driver

    res = driver.run(dm.load("""
problem: {type: fluid}
fluid_dynamic: {dynamictype: onesteptheta, theta: 1.0, timestep: 0.2,
                numstep: 8, maxiter: 12, tolres: 1e-9, toldisp: 1e-11,
                sampling_start: 4}
solver: {method: gmres, precond: jacobi, maxiter: 2000, gmres_restart: 80}
materials:
  1: {type: newtonianfluid, viscosity: 0.1, density: 1.0}
functions:
  1: "4*y*(1-y)"
geometry:
  generator:
    - {kind: rectangle, nx: 6, ny: 4, cell: quad4, mat: 1, name: fluid,
       lo: [0, 0], hi: [2, 1]}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1, 1, 0], val: [1, 0, 0], funct: [1, 0, 0]}
    - {nodes: ymin, onoff: [1, 1, 0], val: [0, 0, 0]}
    - {nodes: ymax, onoff: [1, 1, 0], val: [0, 0, 0]}
"""))
    st = res.states["fluid"]
    assert "tstat" in st
    out = ts.finalize(st["tstat"])
    assert out["n_samples"] == 5.0  # steps 4..8
    x = np.asarray(st["x"]).reshape(-1, 3)
    # near-steady flow: time mean tracks the final field, tiny fluctuations
    # (the startup transient is still decaying over the sampling window)
    np.testing.assert_allclose(out["mean_u"], x[:, :2], atol=2e-2)
    assert np.abs(out["re_stress"]).max() < 1e-3
    # plane profile over the homogeneous x direction recovers the parabola
    f = res.fields["fluid"].f if hasattr(res.fields["fluid"], "f") else None
    coords = np.asarray(
        (f or res.fields["fluid"]).disc.coords)
    pos, prof = ts.plane_profiles(coords, {"u": out["mean_u"]}, axis=1)
    u_mid = prof["u"][np.argmin(np.abs(pos - 0.5)), 0]
    assert u_mid > 0.5  # centerline flow really developed
