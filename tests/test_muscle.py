"""Active muscle materials: Blemker + active-stress evolution.

Validates the AD strain-energy forms against the reference's hand-coded
force laws (ref: src/mat/elast/4C_mat_elast_isomuscle_blemker.cpp,
src/mat/4C_mat_muscle_utils.cpp, 4C_mat_elast_anisoactivestress_evolution).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourc_tpu.materials import make_material

pytestmark = pytest.mark.minimal

BLEMKER = dict(type="muscle_blemker", g1=0.5, g2=0.5, p1=0.05, p2=6.6,
               sigma_max=30.0, lambda_ofl=1.4, lambda_star=1.4,
               alpha=1.0, beta=10.0, t_act_start=0.0)


def _sigma_total(lam, sigma_max, sigma_max_ft, lam_star, lam_ofl, P1, P2):
    """Reference fiber Cauchy stress (4C_mat_muscle_utils.cpp laws)."""
    # passive (lambda_opt = 1)
    P3 = P1 * P2 * np.exp(P2 * (lam_star - 1.0))
    P4 = P1 * (np.exp(P2 * (lam_star - 1.0)) - 1.0) - P3 * lam_star
    if lam <= 1.0:
        fp = 0.0
    elif lam < lam_star:
        fp = P1 * (np.exp(P2 * (lam - 1.0)) - 1.0)
    else:
        fp = P3 * lam + P4
    r = lam / lam_ofl
    if r <= 0.6:
        fa = 9 * (r - 0.4) ** 2
    elif r < 1.4:
        fa = 1 - 4 * (1 - r) ** 2
    else:
        fa = 9 * (r - 1.6) ** 2
    return (sigma_max * fp + sigma_max_ft * fa) * lam / lam_ofl


def test_blemker_stress_free_unactivated():
    m = make_material(dict(BLEMKER))
    S, h = m.evaluate(jnp.eye(3), jnp.zeros(1), dt=0.0)
    assert np.abs(np.asarray(S)).max() < 1e-8


def test_blemker_fiber_stress_matches_force_laws():
    """Along an isochoric uniaxial fiber stretch C = diag(l^2, 1/l, 1/l),
    the shear terms W1, W2 vanish identically, so d psi/d lam must equal
    sigma_total(lam)/lam from the reference's piecewise force-length laws
    — this checks the closed-form antiderivatives AND the AD path."""
    m = make_material(dict(BLEMKER))
    t = 1.0  # activation ft = alpha*tanh(beta*t) ~ 1
    ft = 1.0 * np.tanh(10.0 * t)
    sig_ft = BLEMKER["sigma_max"] * ft

    def psi_of_lam(lam):
        C = jnp.diag(jnp.array([lam**2, 1.0 / lam, 1.0 / lam]))
        return m._psi(C, sig_ft)

    g = jax.grad(psi_of_lam)
    for lam in [1.05, 1.2, 1.5, 1.9, 2.3]:  # spans all passive/active regions
        want = _sigma_total(lam, BLEMKER["sigma_max"], sig_ft,
                            BLEMKER["lambda_star"], BLEMKER["lambda_ofl"],
                            BLEMKER["p1"], BLEMKER["p2"]) / lam
        assert float(g(lam)) == pytest.approx(want, rel=1e-5), lam


def test_blemker_activation_ramps_with_time():
    """tanh activation: stress along the fiber grows monotonically in t and
    saturates at alpha."""
    m = make_material(dict(BLEMKER))
    lam = 1.3
    C = jnp.diag(jnp.array([lam**2, 1.0 / lam, 1.0 / lam]))
    h = jnp.zeros(1)
    s_prev, vals = -1e30, []
    for dt in [0.02, 0.05, 0.1, 0.5, 2.0]:
        S, h = m.evaluate(C, h, dt=dt)
        s11 = float(S[0, 0])
        assert s11 > s_prev
        s_prev = s11
        vals.append(s11)
    # elapsed time now ~2.7 -> tanh saturated: last two nearly equal
    assert vals[-1] == pytest.approx(vals[-2], rel=5e-3)


def test_blemker_cross_fiber_shear_energy():
    """Transverse shear (no fiber stretch) engages only G2 acosh^2 H1 (+ the
    along-fiber G1 term), never the fiber force W3."""
    m = make_material(dict(BLEMKER, sigma_max=0.0))
    gam = 0.3
    F = jnp.eye(3).at[1, 2].set(gam)  # shear in the cross-fiber plane
    C = F.T @ F
    psi = float(m._psi(C, 0.0))
    assert psi > 1e-4  # shear energy engaged
    S, _ = m.evaluate(C, jnp.zeros(1), dt=0.0)
    assert np.all(np.isfinite(np.asarray(S)))


def test_anisoactivestress_tau_saturates_at_sigma0():
    """Constant control u=1, no Frank-Starling: tau' = sigma0 - tau, so
    tau -> sigma0; PK2 gains tau f0 (x) f0."""
    m = make_material({"type": "anisoactivestress", "youngs": 100.0,
                       "nue": 0.3, "sigma0": 25.0, "u_expr": "1"})
    C = jnp.eye(3)
    h = m.init_history(1)[0]
    for _ in range(400):
        S, h = m.evaluate(C, h, dt=0.05)
    assert float(h[0]) == pytest.approx(25.0, rel=1e-3)
    S = np.asarray(S)
    assert S[0, 0] == pytest.approx(25.0, rel=1e-3)  # passive part is 0 at I
    assert abs(S[1, 1]) < 1e-8


def test_anisoactivestress_relaxes_when_u_off():
    """u switches off at t=1: tau decays (no production, |u|=0 freezes tau;
    use a sign-flipping control to verify decay: u=-1 -> tau' = -tau)."""
    m = make_material({"type": "anisoactivestress", "youngs": 100.0,
                       "nue": 0.3, "sigma0": 25.0,
                       "u_expr": "1 - 2*(t > 1)"})
    C = jnp.eye(3)
    h = m.init_history(1)[0]
    for _ in range(20):
        S, h = m.evaluate(C, h, dt=0.05)  # t = 1: tau ~ 25 (1 - e^-1)
    tau_on = float(h[0])
    for _ in range(100):
        S, h = m.evaluate(C, h, dt=0.05)  # u = -1: pure decay
    assert float(h[0]) < 0.05 * tau_on


def test_anisoactivestress_frank_starling_window():
    """n0 parabola: production vanishes outside [lambda_lower, lambda_upper]."""
    m = make_material({"type": "anisoactivestress", "youngs": 100.0,
                       "nue": 0.3, "sigma0": 25.0, "u_expr": "1",
                       "lambda_lower": 1.0, "lambda_upper": 1.4})
    h0 = m.init_history(1)[0]
    lam_out = 1.6  # outside the window -> n0 = 0 -> tau stays ~0
    C_out = jnp.diag(jnp.array([lam_out**2, 1.0, 1.0]))
    _, h = m.evaluate(C_out, h0, dt=0.5)
    assert float(h[0]) == pytest.approx(0.0, abs=1e-10)
    lam_mid = 1.2  # center: n0 = 1
    C_mid = jnp.diag(jnp.array([lam_mid**2, 1.0, 1.0]))
    _, h2 = m.evaluate(C_mid, h0, dt=0.5)
    assert float(h2[0]) > 1.0
