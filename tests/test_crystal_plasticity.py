"""Crystal plasticity: rate-dependent multiplicative Fe-Fp single crystal.

ref: src/mat/4C_mat_crystal_plasticity.* (power-law slip, FCC systems,
work hardening).

Oracles:
- stress-free at C = I; tiny-strain response matches SVK elasticity
- single-slip simple shear: at sustained flow the resolved shear stress
  obeys the power-law flow rule tau = g (gdot_p / gdot0)^m exactly (the
  semi-analytic steady state), and Fp accumulates only on that system
- Schmid behavior: a system with zero resolved shear never slips
- Voce hardening raises g monotonically toward g_sat
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fourc_tpu.materials import make_material

pytestmark = pytest.mark.minimal

E_MOD, NUE = 1000.0, 0.3
MU = E_MOD / (2 * (1 + NUE))


def _single_slip(**kw):
    args = dict(type="crystal_plasticity", youngs=E_MOD, nue=NUE, g0=5.0,
                gdot0=1e-2, rate_m=0.1, nsub=20,
                systems=[[(1, 0, 0), (0, 1, 0)]])
    args.update(kw)
    return make_material(args)


def test_elastic_consistency():
    m = _single_slip(g0=1e6)  # yield far away -> pure elasticity
    h = m.init_history(1)[0]
    eps = 1e-4
    C = jnp.eye(3) + 2 * eps * jnp.diag(jnp.array([1.0, 0.0, 0.0]))
    S, h_new = m.evaluate(C, h, dt=1.0)
    lam = E_MOD * NUE / ((1 + NUE) * (1 - 2 * NUE))
    S_want = lam * eps * np.eye(3) + 2 * MU * eps * np.diag([1.0, 0, 0])
    assert np.allclose(np.asarray(S), S_want, rtol=1e-3, atol=1e-9)
    assert np.allclose(np.asarray(h_new[:9]).reshape(3, 3), np.eye(3),
                       atol=1e-12)
    S0, _ = m.evaluate(jnp.eye(3), h, dt=1.0)
    assert np.abs(np.asarray(S0)).max() < 1e-12


def test_single_slip_steady_state_flow_rule():
    """Drive simple shear F = I + gam e1(x)e2 at constant rate; once
    elastic loading saturates, gdot_plastic = rate and tau must satisfy
    tau = g * (rate/gdot0)^m."""
    m = _single_slip(h0=0.0, nsub=10)
    # dt small enough that the per-step elastic reload (mu*rate*dt ~ 0.1)
    # stays well below the flow stress — the end-of-step sawtooth trough
    # then sits within ~2% of the continuous steady state
    rate, dt, nstep = 1e-2, 0.05, 200
    h = m.init_history(1)[0]
    ev = jax.jit(lambda C, h: m.evaluate(C, h, dt=dt))
    lam = E_MOD * NUE / ((1 + NUE) * (1 - 2 * NUE))

    def resolved_shear(C, h):
        Fpi = np.linalg.inv(np.asarray(h[:9]).reshape(3, 3))
        Ce = Fpi.T @ np.asarray(C) @ Fpi
        Ee = 0.5 * (Ce - np.eye(3))
        Se = lam * np.trace(Ee) * np.eye(3) + 2 * MU * Ee
        return float((Ce @ Se)[0, 1])

    gam = 0.0
    taus = []
    for _ in range(nstep):
        gam += rate * dt
        F = np.eye(3)
        F[0, 1] = gam
        C = jnp.asarray(F.T @ F)
        S, h = ev(C, h)
        taus.append(resolved_shear(C, h))
    Fp = np.asarray(h[:9]).reshape(3, 3)
    g = float(h[9])
    # plastic shear accumulated on the (e1, e2) system only
    assert Fp[0, 1] > 0.5 * gam  # most of the shear is plastic by now
    off = Fp - np.eye(3)
    off[0, 1] = 0.0
    assert np.abs(off).max() < 1e-6
    # steady-state flow rule: the mean over the settled tail must satisfy
    # tau = g (rate/gdot0)^m (the explicit substeps ring a few % around it)
    tau = float(np.mean(taus[-20:]))
    tau_want = g * (rate / 1e-2) ** 0.1
    assert tau == pytest.approx(tau_want, rel=0.04), (tau, tau_want)


def test_schmid_zero_resolved_shear_no_slip():
    """Uniaxial stretch along e3 has zero resolved shear on the
    (e1, e2) system -> no plastic flow at all."""
    m = _single_slip()
    h = m.init_history(1)[0]
    C = jnp.diag(jnp.array([1.0, 1.0, 1.21]))
    ev = jax.jit(lambda C, h: m.evaluate(C, h, dt=1.0))
    for _ in range(10):
        S, h = ev(C, h)
    assert np.allclose(np.asarray(h[:9]).reshape(3, 3), np.eye(3),
                       atol=1e-10)


def test_voce_hardening_monotone():
    m = _single_slip(h0=50.0, g_sat=8.0)
    h = m.init_history(1)[0]
    gs = [float(h[9])]
    ev = jax.jit(lambda C, h: m.evaluate(C, h, dt=0.2))
    gam = 0.0
    for _ in range(40):
        gam += 2e-3
        F = np.eye(3)
        F[0, 1] = gam
        S, h = ev(jnp.asarray(F.T @ F), h)
        gs.append(float(h[9]))
    gs = np.asarray(gs)
    assert gs[-1] > gs[0] + 0.1
    assert np.all(np.diff(gs) >= -1e-12)
    assert gs[-1] <= 8.0 + 1e-9


def test_fcc_systems_well_formed():
    m = make_material({"type": "crystal_plasticity", "youngs": E_MOD,
                       "nue": NUE, "g0": 5.0})
    P = np.asarray(m.P)
    assert P.shape == (12, 3, 3)
    # s orthogonal to n for every system (checked in ctor); traceless dyads
    assert np.abs(np.trace(P, axis1=1, axis2=2)).max() < 1e-12


def test_jvp_differentiable():
    """The element tangent differentiates through the whole substepped
    update (scan + expm + power law)."""
    m = _single_slip()
    h = m.init_history(1)[0]
    F = np.eye(3)
    F[0, 1] = 0.08
    C0 = jnp.asarray(F.T @ F)
    # the power-law response has x^(1/m) curvature, so the FD step must be
    # tiny for the linearization check to converge
    dC = jnp.asarray(np.outer([1.0, 0, 0], [0, 1.0, 0])
                     + np.outer([0, 1.0, 0], [1.0, 0, 0])) * 1e-7

    def s_of_c(C):
        return m.evaluate(C, h, dt=0.25)[0]

    S, dS = jax.jvp(s_of_c, (C0,), (dC,))
    assert np.isfinite(np.asarray(dS)).all()
    S2 = s_of_c(C0 + dC)
    fd = np.asarray(S2 - S)
    assert np.allclose(fd, np.asarray(dS),
                       atol=1e-4 * max(1e-30, np.abs(fd).max()))
