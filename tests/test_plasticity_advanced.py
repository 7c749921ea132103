"""Drucker-Prager / Lemaitre damage / GTN porous plasticity.

Oracles (ref capability: src/mat plasticity family — drucker-prager,
damage, porous metal plasticity):
- DP pure shear yields at sqrt(J2) = xi*c; hydrostatic tension returns to
  the apex p = xi*c/eta; tension/compression asymmetry has the right sign.
- GTN with zero porosity degenerates EXACTLY to von Mises (the yield
  surface reduces to (q/sy)^2 = 1); voids grow under tension + plastic flow.
- Lemaitre damage softens the stress and grows monotonically.
"""

import jax.numpy as jnp
import numpy as np

from fourc_tpu.materials import make_material

E, NU = 1000.0, 0.3
G = E / (2 * (1 + NU))
K = E / (3 * (1 - 2 * NU))


def _dp(**kw):
    p = dict(type="plasticdruckerprager", youngs=E, nue=NU, cohesion=10.0,
             eta=0.4, xi=1.0)
    p.update(kw)
    return make_material(p)


def test_dp_pure_shear_yield():
    m = _dp()
    h = jnp.zeros(10)
    # pure shear strain: p = 0, so f = sqrt(J2) - xi*c; yield at tau = xi*c
    gam = 0.05  # large enough to be well past yield
    eps = jnp.zeros((3, 3)).at[0, 1].set(gam / 2).at[1, 0].set(gam / 2)
    sig, h1 = m.evaluate_small(eps, h)
    p = float(jnp.trace(sig) / 3)
    sqJ2 = float(jnp.sqrt(0.5 * jnp.sum((sig - p * jnp.eye(3)) ** 2)))
    # consistency: sqrt(J2) + eta*p = xi*c (dilatant flow builds p < 0,
    # raising the shear capacity above xi*c)
    assert abs(sqJ2 + 0.4 * p - 10.0) < 1e-8
    assert p < -1e-6  # dilation against confined elastic volume
    assert float(h1[9]) > 0  # hardening variable advanced


def test_dp_apex_return_hydrostatic_tension():
    m = _dp()
    h = jnp.zeros(10)
    eps = 0.05 * jnp.eye(3)  # strong volumetric tension
    sig, _ = m.evaluate_small(eps, h)
    p = float(jnp.trace(sig) / 3)
    s = np.asarray(sig - p * jnp.eye(3))
    assert np.abs(s).max() < 1e-8  # returned to the apex (s = 0)
    assert abs(p - 10.0 / 0.4) < 1e-6  # p_apex = xi*c/eta = 25


def test_dp_tension_compression_asymmetry():
    """Pressure sensitivity: uniaxial compression sustains a higher |stress|
    than tension."""
    m = _dp()
    h = jnp.zeros(10)
    e = 0.04
    sig_t, _ = m.evaluate_small(jnp.diag(jnp.array([e, -NU * e, -NU * e])), h)
    sig_c, _ = m.evaluate_small(jnp.diag(jnp.array([-e, NU * e, NU * e])), h)
    assert abs(float(sig_c[0, 0])) > abs(float(sig_t[0, 0])) + 1.0


def test_gtn_zero_porosity_is_von_mises():
    gtn = make_material({"type": "plasticgtn", "youngs": E, "nue": NU,
                         "yield_stress": 15.0, "isohard": 50.0,
                         "f0": 0.0, "fn": 0.0})
    j2 = make_material({"type": "plasticlinelast", "youngs": E, "nue": NU,
                        "yield_stress": 15.0, "isohard": 50.0})
    h_g = jnp.zeros(11)
    h_j = jnp.zeros(19)
    eps = jnp.diag(jnp.array([0.03, -0.012, -0.012]))
    sg, _ = gtn.evaluate_small(eps, h_g)
    sj, _ = j2.evaluate_small(eps, h_j)
    np.testing.assert_allclose(np.asarray(sg), np.asarray(sj),
                               rtol=2e-3, atol=1e-3)


def test_gtn_void_growth_under_tension():
    gtn = make_material({"type": "plasticgtn", "youngs": E, "nue": NU,
                         "yield_stress": 15.0, "f0": 0.01})
    h = jnp.zeros(11)
    # triaxial tension past yield -> plastic volumetric flow -> f grows
    eps = jnp.diag(jnp.array([0.05, 0.03, 0.03]))
    _, h1 = gtn.evaluate_small(eps, h)
    f_new = float(h1[10])
    assert f_new > 0.01 + 1e-5, f_new
    # porous yield is weaker than the dense matrix: q at yield < sy
    sig, _ = gtn.evaluate_small(jnp.diag(jnp.array([0.04, -0.016, -0.016])),
                                jnp.zeros(11))
    s = sig - jnp.trace(sig) / 3 * jnp.eye(3)
    q = float(jnp.sqrt(1.5 * jnp.sum(s * s)))
    assert q < 15.0


def test_lemaitre_damage_softens():
    dam = make_material({"type": "plasticlemaitre", "youngs": E, "nue": NU,
                         "yield_stress": 15.0, "isohard": 100.0,
                         "s0": 0.05, "s_exp": 1.0})
    j2 = make_material({"type": "plasticlinelast", "youngs": E, "nue": NU,
                        "yield_stress": 15.0, "isohard": 100.0})
    h_d = jnp.zeros(11)
    h_j = jnp.zeros(19)
    # march strain up; damage accumulates and the nominal stress drops
    # below the undamaged curve
    D_prev = 0.0
    for k in range(1, 6):
        eps = jnp.diag(jnp.array([0.01 * k, -NU * 0.01 * k, -NU * 0.01 * k]))
        sig_d, h_d = dam.evaluate_small(eps, h_d)
        sig_j, h_j = j2.evaluate_small(eps, h_j)
        D = float(h_d[10])
        assert D >= D_prev
        D_prev = D
    assert D_prev > 1e-4
    assert float(sig_d[0, 0]) < float(sig_j[0, 0])
