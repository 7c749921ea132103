"""Superelastic SMA + Robinson thermo-viscoplasticity material tests.

Oracles (ref capability: src/mat/4C_mat_superelastic_sma.*,
4C_mat_robinson.*):
- SMA pure-shear strain cycle traces the flag-shaped hysteresis: elastic
  up to the forward plateau, q pinned inside [s_as_s, s_as_f] while
  transforming, xi -> 1 when fully transformed, unloading on the lower
  plateau, and ZERO residual stress/strain/martensite at full unload
  (superelasticity).
- Robinson stress relaxation: above the shear threshold the overstress
  relaxes monotonically toward sqrt(J2) = K(T); below threshold no flow;
  a hotter temperature (thermal softening) relaxes to a lower stress.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fourc_tpu.materials import make_material

pytestmark = pytest.mark.minimal

E, NU = 1000.0, 0.3
G = E / (2 * (1 + NU))


def _shear(g):
    return jnp.asarray([[0.0, g, 0.0], [g, 0.0, 0.0], [0.0, 0.0, 0.0]])


def _q(sig):
    s = sig - jnp.trace(sig) / 3.0 * jnp.eye(3)
    return float(jnp.sqrt(1.5 * jnp.sum(s * s)))


def _sma(**kw):
    p = dict(type="superelastic_sma", youngs=E, nue=NU, eps_l=0.05,
             s_as_s=20.0, s_as_f=30.0, s_sa_s=15.0, s_sa_f=8.0)
    p.update(kw)
    return make_material(p)


def test_sma_flag_hysteresis():
    m = _sma()
    h = jnp.zeros(m.history_shape)
    # elastic regime: q < s_as_s -> no transformation
    sig, h1 = m.evaluate_small(_shear(0.002), h)
    assert _q(sig) < 20.0 and float(h1[9]) == 0.0
    np.testing.assert_allclose(np.asarray(sig)[0, 1], 2 * G * 0.002,
                               rtol=1e-6)

    # strain-driven loading ramp: during transformation q stays on the
    # rising plateau [s_as_s, s_as_f]
    gmax = 0.08
    path_up = np.linspace(0.0, gmax, 80)
    qs, xis = [], []
    h = jnp.zeros(m.history_shape)
    for g in path_up[1:]:
        sig, h = m.evaluate_small(_shear(g), h)
        qs.append(_q(sig))
        xis.append(float(h[9]))
    qs, xis = np.asarray(qs), np.asarray(xis)
    on_plateau = (xis > 0.02) & (xis < 0.98)
    assert on_plateau.any()
    assert (qs[on_plateau] >= 20.0 - 1e-6).all()
    assert (qs[on_plateau] <= 30.0 + 1e-6).all()
    assert xis[-1] == pytest.approx(1.0, abs=1e-6)  # fully transformed

    # unloading: reverse plateau within [s_sa_f, s_sa_s]; full unload
    # recovers everything (superelastic: no residual state)
    h_top = h
    qs_dn, xis_dn = [], []
    for g in path_up[::-1][1:]:
        sig, h = m.evaluate_small(_shear(g), h)
        qs_dn.append(_q(sig))
        xis_dn.append(float(h[9]))
    qs_dn, xis_dn = np.asarray(qs_dn), np.asarray(xis_dn)
    rev = (xis_dn < 0.98) & (xis_dn > 0.02)
    assert rev.any()
    assert (qs_dn[rev] >= 8.0 - 1e-6).all()
    assert (qs_dn[rev] <= 15.0 + 1e-6).all()
    sig0, h = m.evaluate_small(_shear(0.0), h)
    assert _q(sig0) < 1e-3 * E
    assert float(h[9]) == pytest.approx(0.0, abs=1e-8)
    assert float(jnp.abs(h[:9]).max()) < 1e-10

    # dissipation: unloading branch lies strictly below the loading branch
    # at equal strain inside the hysteresis loop
    mid = len(path_up) // 2
    assert qs_dn[::-1][mid] < qs[mid] - 1.0
    del h_top


def test_sma_tangent_is_ad_consistent():
    import jax

    m = _sma()
    h = jnp.zeros(m.history_shape)
    # on the loading plateau the AD tangent d sig12 / d g must be MUCH
    # softer than elastic (plateau modulus), and positive
    for g in np.linspace(0, 0.05, 25)[1:]:
        _, h = m.evaluate_small(_shear(g), h)

    def s12(g):
        sig, _ = m.evaluate_small(_shear(g), h)
        return sig[0, 1]

    slope = float(jax.grad(s12)(0.052))
    assert 0.0 < slope < 0.2 * 2 * G


def _robinson(**kw):
    p = dict(type="robinson", youngs=E, nue=NU, k0=10.0, a_flow=2.0,
             n_exp=2.0, t_ref=20.0)
    p.update(kw)
    return make_material(p)


def test_robinson_relaxation_to_threshold():
    m = _robinson()
    eps = _shear(0.05)  # far above threshold
    h = jnp.zeros(m.history_shape)
    dt = 0.05
    j2s = []
    for _ in range(400):
        sig, h = m.evaluate_small(eps, h, T=20.0, dt=dt)
        s = sig - jnp.trace(sig) / 3.0 * jnp.eye(3)
        j2s.append(float(jnp.sqrt(0.5 * jnp.sum(s * s))))
    j2s = np.asarray(j2s)
    assert (np.diff(j2s) <= 1e-9).all()  # monotone relaxation
    assert j2s[-1] == pytest.approx(10.0, rel=0.02)  # -> K(T)


def test_robinson_below_threshold_no_flow():
    m = _robinson()
    g_small = 10.0 / (2 * G) * 0.5  # sqrt(J2) = K/2 < K
    sig1, h = m.evaluate_small(_shear(g_small), jnp.zeros(m.history_shape),
                               T=20.0, dt=1.0)
    sig2, h = m.evaluate_small(_shear(g_small), h, T=20.0, dt=1.0)
    np.testing.assert_allclose(np.asarray(sig1), np.asarray(sig2),
                               atol=1e-12)
    assert float(jnp.abs(h[:9]).max()) == 0.0


def test_robinson_thermal_softening():
    m = _robinson(omega_t=0.02)
    eps = _shear(0.05)
    outs = {}
    for T in (20.0, 45.0):
        h = jnp.zeros(m.history_shape)
        for _ in range(400):
            sig, h = m.evaluate_small(eps, h, T=T, dt=0.05)
        s = sig - jnp.trace(sig) / 3.0 * jnp.eye(3)
        outs[T] = float(jnp.sqrt(0.5 * jnp.sum(s * s)))
    assert outs[45.0] < outs[20.0] - 0.5  # hotter -> lower threshold
    assert outs[45.0] == pytest.approx(10.0 * (1 - 0.02 * 25.0), rel=0.03)
