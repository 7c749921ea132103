"""Elasthyper summand breadth: stress-free reference, finite stresses, and
analytic cross-checks for the extended summand catalogue.

Counterpart of the reference's per-summand unit tests
(ref: unittests/mat/4C_elasthyper* and src/mat/elast/ summand zoo).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourc_tpu.materials import make_material

# every registered summand with representative parameters
SUMMANDS = [
    {"type": "couplogneohooke", "youngs": 100.0, "nue": 0.3},
    {"type": "coupsaintvenantkirchhoff", "youngs": 100.0, "nue": 0.3},
    {"type": "coupmooneyrivlin", "c1": 10.0, "c2": 5.0, "c3": 100.0},
    {"type": "coupblatzko", "mue": 40.0, "nue": 0.3},
    {"type": "couplogneohooke", "youngs": 100.0, "nue": 0.3},
    {"type": "coupsimopister", "mue": 40.0},
    {"type": "couplogmixneohooke", "youngs": 100.0, "nue": 0.3},
    {"type": "coupexppol", "a": 10.0, "b": 1.0, "c": 1.0},
    {"type": "coup1pow", "c": 10.0, "d": 2},
    {"type": "coup2pow", "c": 10.0, "d": 2},
    {"type": "coup3pow", "c": 10.0, "d": 2},
    {"type": "coup13apow", "c": 10.0, "d": 2, "a": 1.0},
    {"type": "coupvarga", "mue": 40.0, "beta": 40.0},
    {"type": "isovarga", "mue": 40.0, "beta": 40.0},
    {"type": "isoogden", "mue": 40.0, "alpha": 2.0},
    {"type": "isoneohooke", "mue": 40.0},
    {"type": "isoyeoh", "c1": 10.0, "c2": 2.0, "c3": 0.5},
    {"type": "isomooneyrivlin", "c1": 10.0, "c2": 5.0},
    {"type": "isoexpopow", "k1": 10.0, "k2": 1.0, "d": 1},
    {"type": "iso1pow", "c": 10.0, "d": 2},
    {"type": "iso2pow", "c": 10.0, "d": 2},
    {"type": "volsussmanbathe", "kappa": 500.0},
    {"type": "volpenalty", "eps": 100.0, "gam": 2.0},
    {"type": "vologden", "kappa": 500.0, "beta": -2.0},
    {"type": "volpow", "a": 100.0, "expon": 5.0},
    {"type": "coupanisoexpo", "k1": 10.0, "k2": 1.0, "a": [1, 0, 0]},
    {"type": "coupanisoexpo", "k1": 10.0, "k2": 1.0, "a": [1, 0, 0],
     "kappa": 0.2},
    {"type": "coupanisoneohooke", "c": 10.0, "a": [1, 0, 0]},
    {"type": "coupanisopow", "k": 10.0, "d1": 2.0, "d2": 2.0, "a": [1, 0, 0]},
    {"type": "isoanisoexpo", "k1": 10.0, "k2": 1.0, "a": [1, 0, 0]},
    {"type": "coupanisoexpotwocoup", "a4": 10.0, "b4": 1.0, "a6": 8.0,
     "b6": 1.0, "a8": 4.0, "b8": 1.0, "a": [1, 0, 0], "b": [0, 1, 0]},
    {"type": "coupanisoexposhear", "a_fs": 10.0, "b_fs": 1.0,
     "f": [1, 0, 0], "s": [0, 1, 0]},
    {"type": "couptransverselyisotropic", "alpha": 10.0, "beta": 5.0,
     "gamma": 20.0, "a": [1, 0, 0]},
    {"type": "coupanisoexpoactive", "k1": 10.0, "k2": 1.0, "k1comp": 5.0,
     "k2comp": 1.0, "s": 0.0, "a": [1, 0, 0]},
    {"type": "isotestmaterial", "c1": 10.0, "c2": 5.0},
]

IDS = [f"{i}_{s['type']}" for i, s in enumerate(SUMMANDS)]

# a generic large deformation: stretch + shear, J > 0
F = jnp.array([[1.10, 0.05, 0.00],
               [0.02, 0.95, 0.03],
               [0.00, 0.01, 1.08]])
C_DEF = F.T @ F


@pytest.mark.parametrize("spec", SUMMANDS, ids=IDS)
def test_stress_free_reference(spec):
    """PK2(I) = 0 for every summand family that is stress-free by
    construction (pure volumetric/pow terms included: their energies are
    stationary at J=1)."""
    if spec["type"] == "coupanisoneohooke":
        # psi = c (I4 - 1) carries a reference fiber prestress by design
        pytest.skip("prestressed by construction")
    m = make_material({"type": "elasthyper", "summands": [dict(spec)]})
    S = np.asarray(m.pk2(jnp.eye(3)))
    scale = max(abs(v) for v in spec.values() if isinstance(v, (int, float)))
    # coup3pow with d=2 etc are stationary at I3=1; all catalogue entries
    # above are stress-free at C=I
    assert np.abs(S).max() < 1e-6 * scale, (spec["type"], S)


@pytest.mark.parametrize("spec", SUMMANDS, ids=IDS)
def test_finite_stress_and_tangent(spec):
    """Deformed state: psi finite, PK2 finite, AD tangent (jvp) finite."""
    m = make_material({"type": "elasthyper", "summands": [dict(spec)]})
    psi = float(m.psi(C_DEF))
    S = np.asarray(m.pk2(C_DEF))
    assert np.isfinite(psi)
    assert np.all(np.isfinite(S))
    dC = jnp.array(np.random.default_rng(0).normal(size=(3, 3)))
    dC = 0.5 * (dC + dC.T) * 1e-3
    _, dS = jax.jvp(m.pk2, (C_DEF,), (dC,))
    assert np.all(np.isfinite(np.asarray(dS)))


def test_coupsvk_matches_closed_form():
    """coupsaintvenantkirchhoff == the dedicated StVenantKirchhoff law."""
    eh = make_material({"type": "elasthyper", "summands": [
        {"type": "coupsaintvenantkirchhoff", "youngs": 250.0, "nue": 0.3}]})
    svk = make_material({"type": "stvenantkirchhoff", "youngs": 250.0, "nue": 0.3})
    np.testing.assert_allclose(np.asarray(eh.pk2(C_DEF)),
                               np.asarray(svk.pk2(C_DEF)), rtol=1e-10)


def test_isoogden_alpha2_equals_isoneohooke():
    """Ogden with alpha=2: 2mu/4 (sum lbar^2 - 3) = mu/2 (I1b - 3)."""
    og = make_material({"type": "elasthyper", "summands": [
        {"type": "isoogden", "mue": 40.0, "alpha": 2.0}]})
    nh = make_material({"type": "elasthyper", "summands": [
        {"type": "isoneohooke", "mue": 40.0}]})
    # rtol bounded by the 1e-10 eigenvalue-splitting jitter in the
    # principal-stretch path
    np.testing.assert_allclose(float(og.psi(C_DEF)), float(nh.psi(C_DEF)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(og.pk2(C_DEF)),
                               np.asarray(nh.pk2(C_DEF)), rtol=1e-6,
                               atol=1e-8)


def test_goh_dispersion_interpolates():
    """kappa=1/3 turns the GOH fiber term isotropic (I4* = I1/3); kappa=0
    recovers the aligned Holzapfel term."""
    mk = lambda kappa: make_material({"type": "elasthyper", "summands": [
        {"type": "coupanisoexpo", "k1": 10.0, "k2": 1.0, "a": [1, 0, 0],
         "kappa": kappa, "tension_only": False}]})
    # aligned: uniaxial stretch along fiber loads it; transverse does not
    C_ax = jnp.diag(jnp.array([1.2**2, 1.0, 1.0]))
    C_tr = jnp.diag(jnp.array([1.0, 1.2**2, 1.0]))
    m0 = mk(0.0)
    assert float(m0.psi(C_ax)) > 1e-3
    assert float(m0.psi(C_tr)) == pytest.approx(0.0, abs=1e-12)
    # isotropic dispersion: both directions equivalent
    mi = mk(1.0 / 3.0)
    np.testing.assert_allclose(float(mi.psi(C_ax)), float(mi.psi(C_tr)),
                               rtol=1e-12)


def test_twocoup_shear_invariant():
    """I8 coupling term activates only under fiber-fiber shear."""
    m = make_material({"type": "elasthyper", "summands": [
        {"type": "coupanisoexpotwocoup", "a4": 0.0001, "b4": 1.0,
         "a6": 0.0001, "b6": 1.0, "a8": 10.0, "b8": 1.0,
         "a": [1, 0, 0], "b": [0, 1, 0]}]})
    gamma = 0.1
    F_sh = jnp.eye(3).at[0, 1].set(gamma)  # simple shear in the a-b plane
    C_sh = F_sh.T @ F_sh
    # I8 = a.C.b = gamma -> psi ~ a8/(2 b8)(e^{b8 gamma^2}-1)
    want = 10.0 / 2.0 * (np.exp(0.1**2) - 1.0)
    assert float(m.psi(C_sh)) == pytest.approx(want, rel=1e-3)


def test_principal_stretch_gradients_at_identity():
    """The eig-jitter guard: AD through stretch-based summands stays finite
    exactly at the undeformed state (degenerate eigenvalues)."""
    m = make_material({"type": "elasthyper", "summands": [
        {"type": "isoogden", "mue": 40.0, "alpha": 1.7}]})
    S = np.asarray(m.pk2(jnp.eye(3)))
    assert np.all(np.isfinite(S))
    assert np.abs(S).max() < 1e-5


def test_exposhear_matches_twocoup_i8_term():
    """The standalone shear summand equals the I8 part of twocoup."""
    m = make_material({"type": "elasthyper", "summands": [
        {"type": "coupanisoexposhear", "a_fs": 10.0, "b_fs": 1.0,
         "f": [1, 0, 0], "s": [0, 1, 0]}]})
    gamma = 0.1
    F_sh = jnp.eye(3).at[0, 1].set(gamma)
    C_sh = F_sh.T @ F_sh
    want = 10.0 / 2.0 * (np.exp(0.1**2) - 1.0)
    assert float(m.psi(C_sh)) == pytest.approx(want, rel=1e-3)


def test_transversely_isotropic_energy_value():
    """psi matches the reference closed form
    (ref: 4C_mat_elast_couptransverselyisotropic.cpp:173)."""
    alpha, beta, gamma = 10.0, 5.0, 20.0
    m = make_material({"type": "elasthyper", "summands": [
        {"type": "couptransverselyisotropic", "alpha": alpha, "beta": beta,
         "gamma": gamma, "a": [1, 0, 0]}]})
    C = np.asarray(C_DEF)
    I3 = np.linalg.det(C)
    I4 = C[0, 0]
    I5 = (C @ C)[0, 0]
    want = (alpha + 0.5 * beta * np.log(I3) + gamma * (I4 - 1.0)) * (I4 - 1.0) \
        - 0.5 * alpha * (I5 - 1.0)
    assert float(m.psi(C_DEF)) == pytest.approx(float(want), rel=1e-6)


def test_expoactive_active_stress_along_fiber():
    """With k1=0 the summand reduces to the constant active fiber tension:
    S = dPsi_act * A / I4 (ref: 4C_mat_elast_coupanisoexpoactive.cpp
    evaluate_active_stress_cmat_aniso)."""
    s, dens, lmax, l0 = 50.0, 1.0, 1.4, 0.8
    m = make_material({"type": "elasthyper", "summands": [
        {"type": "coupanisoexpoactive", "k1": 1e-12, "k2": 1.0,
         "s": s, "dens": dens, "lambdamax": lmax, "lambda0": l0,
         "a": [1, 0, 0]}]})
    C = jnp.diag(jnp.array([1.2**2, 0.95, 0.9]))
    S = np.asarray(m.pk2(C))
    dpsi_act = s / dens * (1.0 - (lmax - 1.0) ** 2 / (lmax - l0) ** 2)
    want = dpsi_act / 1.2**2
    assert S[0, 0] == pytest.approx(want, rel=1e-5)
    assert abs(S[1, 1]) < 1e-8 and abs(S[2, 2]) < 1e-8
