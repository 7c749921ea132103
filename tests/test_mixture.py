"""Constrained-mixture framework (ref: src/mixture).

Validates rule composition, prestretch deposition, growth-strategy
kinematics, and the tensional-homeostasis fixed point of the remodel
fiber ODEs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fourc_tpu.materials import make_material
from fourc_tpu.materials.mixture import _fiber_cauchy

pytestmark = pytest.mark.minimal

NH = {"type": "elasthyper", "summands": [
    {"type": "couplogneohooke", "youngs": 100.0, "nue": 0.3}]}

F = jnp.array([[1.08, 0.04, 0.0],
               [0.00, 0.96, 0.02],
               [0.00, 0.00, 1.05]])
C_DEF = F.T @ F


def _mk(**kw):
    return make_material({"type": "mixture_rule", **kw})


def test_simple_rule_is_weighted_sum():
    """Two Neo-Hooke constituents at fractions (0.3, 0.7) == the plain
    material (fractions sum to 1, same law)."""
    m = _mk(rule="simple", constituents=[
        {"kind": "solid", "frac": 0.3, "material": dict(NH)},
        {"kind": "solid", "frac": 0.7, "material": dict(NH)}])
    mono = make_material(dict(NH))
    h = m.init_history(1)[0]
    S, _ = m.evaluate(C_DEF, h, dt=0.1)
    np.testing.assert_allclose(np.asarray(S), np.asarray(mono.pk2(C_DEF)),
                               rtol=1e-10, atol=1e-12)


def test_constant_prestretch_shifts_stress_free_state():
    """A constituent deposited with isotropic prestretch G = lam_pre I is
    stress-free at C = I/lam_pre^2 and prestressed at C = I
    (ref: 4C_mixture_prestress_strategy_constant.*)."""
    lam_pre = 1.1
    m = _mk(rule="simple", constituents=[
        {"kind": "solid", "frac": 1.0, "material": dict(NH),
         "prestretch": [lam_pre, lam_pre, lam_pre]}])
    h = m.init_history(1)[0]
    S0, _ = m.evaluate(jnp.eye(3) / lam_pre**2, h, dt=0.0)
    assert np.abs(np.asarray(S0)).max() < 1e-9
    S1, _ = m.evaluate(jnp.eye(3), h, dt=0.0)
    assert np.abs(np.asarray(S1)).max() > 1.0  # carries deposition stress


FIBER = {"kind": "remodelfiber", "frac": 1.0, "k1": 10.0, "k2": 2.0,
         "a": [1, 0, 0], "lambda_pre": 1.1, "k_sig": 1.0,
         "decay_time": 2.0}


def test_fiber_homeostasis_is_a_fixed_point():
    """At the reference state the deposited fiber carries exactly sig_h, so
    growth and remodel rates vanish: h stays [1, 1/lambda_pre]."""
    m = _mk(rule="growthremodel", constituents=[dict(FIBER)])
    h = m.init_history(1)[0]
    _, h1 = m.evaluate(jnp.eye(3), h, dt=0.05)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h),
                               rtol=1e-10, atol=1e-12)


def test_fiber_overload_grows_mass_and_remodels_toward_homeostasis():
    """Step fiber overstretch: sigma > sig_h -> mass production (g rises)
    AND lambda_r increases so the ELASTIC stretch decays back toward the
    homeostatic value (tensional homeostasis; Cyron/Humphrey)."""
    f = dict(FIBER, impl=True)
    m = _mk(rule="growthremodel", constituents=[f])
    lam = 1.04
    C = jnp.diag(jnp.array([lam**2, 1 / lam, 1 / lam]))
    h = m.init_history(1)[0]
    fib = m.fibers[0]

    def sig_of(h):
        # current elastic I4 (isotropic growth: lam_ext = g_tot^(1/3))
        g_tot = float(h[0])
        lam_ext = g_tot ** (1.0 / 3.0)
        I4 = lam**2 / (float(h[1]) * lam_ext) ** 2
        return float(_fiber_cauchy(fib.k1, fib.k2, jnp.asarray(I4)))

    dsig0 = abs(sig_of(h) - fib.sig_h)
    g_prev = 1.0
    for _ in range(300):
        _, h = m.evaluate(C, h, dt=0.05)
    assert float(h[0]) > g_prev  # mass grew
    assert float(h[1]) > 1.0 / fib.lambda_pre  # remodeled (lambda_r up)
    dsigT = abs(sig_of(h) - fib.sig_h)
    assert dsigT < 0.05 * dsig0  # stress relaxed back to sig_h


def test_growth_strategy_determinants():
    """det(Fg) = growth scalar for both isotropic and anisotropic
    strategies; anisotropic growth is uniaxial along g
    (ref: 4C_mixture_growth_strategy_{isotropic,anisotropic}.cpp)."""
    mi = _mk(rule="growthremodel", constituents=[dict(FIBER)])
    ma = _mk(rule="growthremodel", constituents=[dict(FIBER)],
             growth_strategy={"kind": "anisotropic", "g": [0, 0, 1]})
    g = 1.3
    iFg_i = np.asarray(mi._iFg(g, jnp.float64))
    iFg_a = np.asarray(ma._iFg(g, jnp.float64))
    assert 1.0 / np.linalg.det(iFg_i) == pytest.approx(g, rel=1e-12)
    assert 1.0 / np.linalg.det(iFg_a) == pytest.approx(g, rel=1e-12)
    # anisotropic: transverse directions undeformed
    assert iFg_a[0, 0] == pytest.approx(1.0) and iFg_a[1, 1] == pytest.approx(1.0)
    assert iFg_a[2, 2] == pytest.approx(1.0 / g)


def test_stiffness_strategy_scales_stress_without_kinematics():
    """'stiffness' growth: no Fg, the grown mass only scales the stress
    (ref: 4C_mixture_growth_strategy_stiffness.*)."""
    m = _mk(rule="growthremodel",
            growth_strategy={"kind": "stiffness"},
            constituents=[dict(FIBER, k_sig=0.0, basal=False,
                               decay_time=1e12)])
    lam = 1.2
    C = jnp.diag(jnp.array([lam**2, 1.0, 1.0]))
    h = m.init_history(1)[0]
    S1, _ = m.evaluate(C, h, dt=0.0)
    h2 = h.at[0].set(2.0)  # doubled fiber mass
    S2, _ = m.evaluate(C, h2, dt=0.0)
    np.testing.assert_allclose(np.asarray(S2), 2.0 * np.asarray(S1),
                               rtol=1e-10)


def test_mixed_solid_plus_fiber_composition():
    """Matrix + fiber mixture: finite stress, fiber only loads its
    direction on top of the isotropic matrix response."""
    m = _mk(rule="growthremodel", constituents=[
        {"kind": "solid", "frac": 0.5, "material": dict(NH)},
        dict(FIBER, frac=0.5)])
    h = m.init_history(1)[0]
    S, h1 = m.evaluate(C_DEF, h, dt=0.01)
    assert np.all(np.isfinite(np.asarray(S)))
    assert np.all(np.isfinite(np.asarray(h1)))
