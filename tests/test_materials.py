"""Material library unit tests (tier-1 analog of unittests/mat)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourc_tpu.materials import make_material
from fourc_tpu.materials.base import HyperelasticMaterial


def rand_C(key=0, mag=0.1):
    rng = np.random.RandomState(key)
    F = np.eye(3) + mag * rng.randn(3, 3)
    return jnp.asarray(F.T @ F)


def test_svk_ad_matches_hand_tangent():
    m = make_material({"type": "stvenantkirchhoff", "youngs": 200.0, "nue": 0.3})
    C = rand_C(1)
    S_hand = m.pk2(C)
    S_ad = 2.0 * jax.grad(m.psi)(C)
    assert np.abs(np.asarray(S_hand - S_ad)).max() < 1e-10


def test_neohooke_ad_matches_hand():
    m = make_material({"type": "neohooke", "youngs": 200.0, "nue": 0.3})
    C = rand_C(2)
    S_hand = m.pk2(C)
    S_ad = 2.0 * jax.grad(m.psi)(C)
    assert np.abs(np.asarray(S_hand - S_ad)).max() < 1e-8


def test_stress_free_reference():
    for spec in [
        {"type": "stvenantkirchhoff", "youngs": 10.0, "nue": 0.25},
        {"type": "neohooke", "youngs": 10.0, "nue": 0.25},
        {"type": "mooneyrivlin", "c1": 1.0, "c2": 0.5, "kappa": 10.0},
        {"type": "elasthyper", "summands": [
            {"type": "couplogneohooke", "youngs": 10.0, "nue": 0.25},
            {"type": "isoyeoh", "c1": 1.0, "c2": 0.1, "c3": 0.0},
            {"type": "vologden", "kappa": 100.0, "beta": -2.0},
        ]},
    ]:
        m = make_material(spec)
        S = m.pk2(jnp.eye(3))
        assert np.abs(np.asarray(S)).max() < 1e-10, spec["type"]


def test_elasthyper_composition_equals_sum():
    m1 = make_material({"type": "elasthyper", "summands": [
        {"type": "couplogneohooke", "youngs": 100.0, "nue": 0.3}]})
    m2 = make_material({"type": "neohooke", "youngs": 100.0, "nue": 0.3})
    C = rand_C(3)
    assert np.abs(np.asarray(m1.pk2(C) - m2.pk2(C))).max() < 1e-8


def test_small_strain_consistency():
    """Finite-strain law linearized at I equals small-strain law."""
    m = make_material({"type": "stvenantkirchhoff", "youngs": 70.0, "nue": 0.3})
    lin = make_material({"type": "linelastic", "youngs": 70.0, "nue": 0.3})
    eps = 1e-4 * jnp.asarray(np.random.RandomState(4).randn(3, 3))
    eps = 0.5 * (eps + eps.T)
    assert np.abs(np.asarray(m.stress_small(eps) - lin.stress_small(eps))).max() < 1e-10


def test_j2_plasticity_uniaxial_yield():
    """Uniaxial stress must not exceed yield (perfect plasticity)."""
    m = make_material({
        "type": "plasticlinelast", "youngs": 1000.0, "nue": 0.3,
        "yield_stress": 10.0, "isohard": 0.0,
    })
    h = jnp.zeros(19)
    # strain-driven uniaxial loading with lateral contraction ~ elastic
    sig_hist = []
    for e in np.linspace(0, 0.05, 26):
        eps = jnp.diag(jnp.asarray([e, -0.3 * e, -0.3 * e]))
        sig, h = m.evaluate_small(eps, h)
        # von Mises stress
        s = sig - jnp.trace(sig) / 3 * jnp.eye(3)
        q = float(jnp.sqrt(1.5 * jnp.sum(s * s)))
        sig_hist.append(q)
    assert max(sig_hist) <= 10.0 + 1e-8
    assert sig_hist[-1] == pytest.approx(10.0, abs=1e-6)


def test_j2_isotropic_hardening_slope():
    """Plastic tangent modulus for linear isotropic hardening: E H/(E+H)."""
    E, H = 1000.0, 100.0
    m = make_material({
        "type": "plasticlinelast", "youngs": E, "nue": 0.0,
        "yield_stress": 1.0, "isohard": H,
    })
    h = jnp.zeros(19)
    eps_vals = np.linspace(0, 0.05, 51)
    sig_vals = []
    for e in eps_vals:
        eps = jnp.diag(jnp.asarray([e, 0.0, 0.0]))
        # uniaxial STRAIN with nue=0 gives uniaxial stress state? not quite
        # (lateral stresses appear after yield) — use only as monotonic check
        sig, h = m.evaluate_small(eps, h)
        sig_vals.append(float(sig[0, 0]))
    d = np.diff(sig_vals)
    assert (d > 0).all()  # hardening: monotonically increasing
    assert d[-1] < d[0]  # post-yield slope below elastic


def test_visco_sls_relaxation():
    """Stress relaxes exponentially toward equilibrium branch."""
    m = make_material({
        "type": "visconeohooke", "youngs": 100.0, "nue": 0.0,
        "mu_v": 50.0, "tau": 1.0,
    })
    eps = jnp.diag(jnp.asarray([0.01, 0.0, 0.0]))
    h = jnp.zeros(18)
    dt = 0.1
    sig0, h = m.evaluate_small(eps, h, dt)
    for _ in range(200):
        sig, h = m.evaluate_small(eps, h, dt)
    # long-time: overstress decays to ~0 -> equilibrium SVK stress
    eq = 100.0 * 0.01  # E*eps for nue=0
    assert float(sig[0, 0]) == pytest.approx(eq, rel=1e-3)
    assert float(sig0[0, 0]) > float(sig[0, 0])


def test_anisotropic_fiber_stiffens_fiber_direction():
    m = make_material({"type": "elasthyper", "summands": [
        {"type": "couplogneohooke", "youngs": 10.0, "nue": 0.3},
        {"type": "coupanisoexpo", "k1": 10.0, "k2": 1.0, "a": [1, 0, 0]},
    ]})
    iso = make_material({"type": "neohooke", "youngs": 10.0, "nue": 0.3})
    lam = 1.2
    C = jnp.diag(jnp.asarray([lam**2, 1.0, 1.0]))
    assert float(m.pk2(C)[0, 0]) > float(iso.pk2(C)[0, 0])
    # compression: tension-only fiber inactive
    Cc = jnp.diag(jnp.asarray([0.9**2, 1.0, 1.0]))
    assert float(m.pk2(Cc)[0, 0]) == pytest.approx(float(iso.pk2(Cc)[0, 0]), abs=1e-9)


def test_finite_strain_log_plasticity():
    """plasticnlnlogneohooke analog: (1) matrix log correctness incl.
    repeated eigenvalues, (2) small-strain limit == small-strain J2, (3)
    uniaxial flow stress follows sy + H*alpha at moderate strain."""
    import jax
    import jax.numpy as jnp

    from fourc_tpu.materials import make_material
    from fourc_tpu.materials.plasticity import _logm_spd

    # matrix log: diag + repeated eigenvalues + generic SPD
    C = jnp.diag(jnp.asarray([1.2, 0.9, 0.9]))
    L = _logm_spd(C)
    assert np.allclose(np.diag(L), np.log([1.2, 0.9, 0.9]), atol=1e-10)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((3, 3)) * 0.1
    Cg = jnp.asarray(np.eye(3) + B @ B.T)
    import scipy.linalg as sla

    assert np.allclose(_logm_spd(Cg), sla.logm(np.asarray(Cg)), atol=1e-9)
    # AD-smoothness at C = I (the eigh-based form would NaN here)
    g = jax.jacfwd(lambda c: _logm_spd(c))(jnp.eye(3))
    assert np.all(np.isfinite(np.asarray(g)))

    m = make_material({"type": "plasticnlnlogneohooke", "youngs": 1000.0,
                       "nue": 0.3, "yield_stress": 5.0, "isohard": 100.0})

    # uniaxial stretch ramp (drive lateral contraction so stress is 1D)
    h = jnp.zeros((7,))
    lam_hist, s_hist = [], []
    lat = 1.0
    for lam in np.linspace(1.0, 1.10, 41)[1:]:
        # solve lateral stretch for zero lateral stress (secant iterations)
        for _ in range(25):
            C = jnp.diag(jnp.asarray([lam**2, lat**2, lat**2]))
            S, hn = m.evaluate(C, h)
            # lateral Cauchy-ish measure ~ S[1,1]*lat^2
            s_lat = float(S[1, 1]) * lat**2
            dd = 1e-5
            C2 = jnp.diag(jnp.asarray([lam**2, (lat + dd) ** 2, (lat + dd) ** 2]))
            S2, _ = m.evaluate(C2, h)
            d = (float(S2[1, 1]) * (lat + dd) ** 2 - s_lat) / dd
            lat = lat - s_lat / d
            if abs(s_lat) < 1e-10:
                break
        C = jnp.diag(jnp.asarray([lam**2, lat**2, lat**2]))
        S, h = m.evaluate(C, h)
        # axial Kirchhoff stress tau = lam^2 S_11 (uniaxial, coaxial)
        s_hist.append(float(S[0, 0]) * lam**2)
        lam_hist.append(lam)
    s_hist = np.array(s_hist)
    alpha = float(h[6])
    assert alpha > 0.01  # well into the plastic range
    # flow stress tracks the hardening law
    assert abs(s_hist[-1] - (5.0 + 100.0 * alpha)) < 0.35, (
        s_hist[-1], alpha)
    # elastic initial slope ~ E (log-strain space)
    e0 = np.log(lam_hist[0])
    assert abs(s_hist[0] / e0 - 1000.0) / 1000.0 < 0.1


def test_viscoelasthyper_relaxation():
    """Held uniaxial stretch: stress relaxes from (1+beta) S_eq to S_eq
    with the prescribed time constant (ref: 4C_mat_viscoelasthyper.*)."""
    import jax.numpy as jnp

    from fourc_tpu.materials import make_material

    tau, beta = 2.0, 0.5
    m = make_material({"type": "viscoelasthyper",
                       "material": {"type": "neohooke", "youngs": 100.0,
                                    "nue": 0.3},
                       "taus": [tau], "betas": [beta]})
    lam = 1.05
    C = jnp.diag(jnp.asarray([lam**2, 1.0, 1.0]))
    h = jnp.zeros((12,))
    dt = 0.05
    # step 1: sudden stretch -> overstress (1 + beta e^{-dt/2tau}) S_eq
    S, h = m.evaluate(C, h, dt=dt)
    base = make_material({"type": "neohooke", "youngs": 100.0, "nue": 0.3})
    Seq = base.pk2_from_E((0.5 * (C - jnp.eye(3)))[..., None])[..., 0]
    s0 = float(S[0, 0])
    assert s0 > 1.4 * float(Seq[0, 0])
    # hold: decay toward S_eq with tau
    s_hist = []
    for _ in range(200):
        S, h = m.evaluate(C, h, dt=dt)
        s_hist.append(float(S[0, 0]))
    assert abs(s_hist[-1] - float(Seq[0, 0])) < 5e-3 * float(Seq[0, 0])
    # decay constant: ratio after one tau ~ e^-1 of the overstress
    over0 = s0 - float(Seq[0, 0])
    k_tau = int(tau / dt)
    over_tau = s_hist[k_tau - 1] - float(Seq[0, 0])
    assert abs(over_tau / over0 - np.exp(-1.0)) < 0.05
