"""Thermo-plasticity: temperature-dependent J2 + thermal eigenstrain.

ref: src/mat/4C_mat_thermoplastichyperelast.* (sigma_y(T) softening) +
4C_mat_thermostvenantkirchhoff.* (thermal expansion).

Oracles:
- at T = T_ref the model is EXACTLY the isothermal J2 return map
- free thermal expansion is stress-free (eigenstrain split)
- a hotter Gauss point yields at a lower stress (omega_T softening),
  verified at the uniaxial analytic first-yield point
- element-level: the kernel routes per-GP temperatures into the return
  map (needs_temp) — a heated bar under the same strain carries less
  stress than a cold one
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fourc_tpu.materials import make_material

pytestmark = pytest.mark.minimal

E_MOD, NUE, SY = 1000.0, 0.3, 10.0


def _mat(**kw):
    args = dict(type="thermoplastic_j2", youngs=E_MOD, nue=NUE,
                yield_stress=SY, isohard=50.0, omega_t=0.02,
                alpha_t=1e-4, t_ref=20.0)
    args.update(kw)
    return make_material(args)


def _uniaxial_eps(e):
    return jnp.diag(jnp.array([e, 0.0, 0.0]))


def test_isothermal_matches_j2():
    m = _mat()
    mj2 = make_material({"type": "plasticlinelast", "youngs": E_MOD,
                         "nue": NUE, "yield_stress": SY, "isohard": 50.0})
    h = jnp.zeros(10)
    hj = jnp.zeros(19)
    for e in (0.005, 0.012, 0.02):
        s1, h = m.evaluate_small(_uniaxial_eps(e), h, T=20.0)
        s2, hj = mj2.evaluate_small(_uniaxial_eps(e), hj)
        assert np.allclose(np.asarray(s1), np.asarray(s2), atol=1e-9)


def test_free_thermal_expansion_stress_free():
    m = _mat()
    h = jnp.zeros(10)
    dT = 35.0
    eps_th = 1e-4 * dT * jnp.eye(3)
    s, h2 = m.evaluate_small(eps_th, h, T=20.0 + dT)
    assert np.abs(np.asarray(s)).max() < 1e-10
    assert np.abs(np.asarray(h2[:9])).max() < 1e-12  # no plastic flow


def test_hot_softening_first_yield():
    """Uniaxial strain loading: first yield when q = sy(T).  For
    eps = diag(e,0,0): s_dev has q = E_MOD*e*(1-2nu+1)/... use the
    computed trial q to find the analytic first-yield strain and check
    plastic onset straddles it at both temperatures."""
    for dT in (0.0, 30.0):
        m = _mat(alpha_t=0.0)
        sy_T = SY * (1.0 - 0.02 * dT)
        G = E_MOD / (2 * (1 + NUE))
        # q_tr for uniaxial strain diag(e,0,0): dev = e*diag(2/3,-1/3,-1/3)
        # q = sqrt(3/2)*|s| = 2 G e  (|dev_eps| = e sqrt(2/3))
        e_yield = sy_T / (2.0 * G)
        h = jnp.zeros(10)
        s_below, h1 = m.evaluate_small(_uniaxial_eps(0.98 * e_yield), h,
                                       T=20.0 + dT)
        assert np.abs(np.asarray(h1[:9])).max() < 1e-14, dT
        s_above, h2 = m.evaluate_small(_uniaxial_eps(1.1 * e_yield), h,
                                       T=20.0 + dT)
        assert np.asarray(h2)[9] > 1e-6, dT


def test_element_kernel_routes_temperature():
    from fourc_tpu.core.cells import get_cell
    from fourc_tpu.ops import solid as ops

    m = _mat(alpha_t=0.0)
    cell = get_cell("hex8")
    X = jnp.asarray(np.array([
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float))[None]
    e = 0.02
    u = (X * jnp.array([e, 0.0, 0.0])).reshape(1, 8, 3)
    hist = jnp.zeros((1, cell.ngp, 10))
    T_cold = jnp.full((1, cell.ngp), 20.0)
    T_hot = jnp.full((1, cell.ngp), 60.0)
    f_cold, h_c = ops.internal_force(X, u, cell, m, kinem="linear",
                                     history=hist, temps=T_cold)
    f_hot, h_h = ops.internal_force(X, u, cell, m, kinem="linear",
                                    history=hist, temps=T_hot)
    # hotter -> softer flow stress -> smaller reaction forces
    assert np.abs(np.asarray(f_hot)).max() < np.abs(np.asarray(f_cold)).max()
    # and more accumulated plastic strain
    assert float(h_h[0, 0, 9]) > float(h_c[0, 0, 9])
