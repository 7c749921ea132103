"""Lattice (structured stencil) operators vs the general assembly path.

Oracle: the unstructured gather/element-kernel/scatter path of
SolidField.internal_force — the two must agree to roundoff on a uniform
box mesh with mixed Dirichlet faces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourc_tpu.core import gridgen
from fourc_tpu.core.cells import get_cell
from fourc_tpu.materials import make_material
from fourc_tpu.ops import lattice as lat
from fourc_tpu.ops import solid as sops


@pytest.fixture(scope="module")
def box():
    # deliberately anisotropic element counts to catch axis mix-ups
    disc = gridgen.box(4, 3, 5, cell="hex8", hi=(1.2, 0.7, 2.0))
    spec = lat.detect_lattice(disc)
    assert spec is not None
    return disc, spec


def _rand_u(disc, scale=1e-2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=disc.n_nodes * 3) * scale)


def test_detect_lattice_rejects_unstructured(box):
    disc, _ = box
    import copy

    d2 = copy.deepcopy(disc)
    d2.coords[3] += 0.01  # break uniformity
    assert lat.detect_lattice(d2) is None


def test_layout_roundtrip(box):
    disc, spec = box
    v = _rand_u(disc)
    w = lat.from_lattice(lat.to_lattice(v, spec), spec)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(w))


def _oracle_force(disc, u, mat, kinem="nonlinear"):
    from fourc_tpu.physics import solid as ps

    params = ps.SolidParams(kinem=kinem, dyntype="statics")
    f = ps.SolidField(disc, {1: mat}, params)
    fi, _ = f.internal_force(u)
    return f, fi


def test_stencil_matvec_matches_linear_tangent(box):
    disc, spec = box
    mat = make_material({"type": "neohooke", "youngs": 200.0, "nue": 0.3,
                         "density": 1.0})
    from fourc_tpu.materials.small_strain import LinearElastic

    lin = LinearElastic(youngs=200.0, nue=0.3)
    cell = get_cell("hex8")
    # congruent-element stiffness
    Xe1 = jnp.asarray(disc.coords[disc.blocks["hex8"].conn[:1]])
    Ke = sops.element_stiffness(Xe1, jnp.zeros_like(Xe1), cell, lin,
                                kinem="linear")[0]
    K = lat.collapse_stencil(np.asarray(Ke))

    f, _ = _oracle_force(disc, jnp.zeros(spec.ndof), lin, kinem="linear")
    v = _rand_u(disc, seed=3)
    _, want = jax.jvp(lambda u: f.internal_force(u)[0],
                      (jnp.zeros(spec.ndof),), (v,))
    got = lat.stencil_matvec_flat(K, v, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("mtype", ["neohooke", "stvenantkirchhoff"])
def test_lattice_force_matches_assembly(box, mtype):
    disc, spec = box
    mat = make_material({"type": mtype, "youngs": 500.0, "nue": 0.3,
                         "density": 1.0})
    u = _rand_u(disc, scale=5e-2, seed=1)
    f, want = _oracle_force(disc, u, mat)
    cell = get_cell("hex8")
    force = lat.make_force_flat(spec, cell, mat)
    assert force is not None
    got = force(u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-9, atol=2e-9)


def test_lattice_jvp_matches_assembly(box):
    disc, spec = box
    mat = make_material({"type": "neohooke", "youngs": 500.0, "nue": 0.3,
                         "density": 1.0})
    u = _rand_u(disc, scale=5e-2, seed=1)
    v = _rand_u(disc, seed=2)
    f, _ = _oracle_force(disc, u, mat)
    _, want = jax.jvp(lambda x: f.internal_force(x)[0], (u,), (v,))
    cell = get_cell("hex8")
    force = lat.make_force_flat(spec, cell, mat)
    _, got = jax.jvp(force, (u,), (v,))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-9, atol=2e-9)


def test_mass_stencil_matches_consistent_mass(box):
    disc, spec = box
    rho = 2.7
    cell = get_cell("hex8")
    Xe1 = jnp.asarray(disc.coords[disc.blocks["hex8"].conn[:1]])
    v1 = jnp.eye(24).reshape(24, 1, 8, 3)
    cols = jnp.stack([
        sops.consistent_mass_matvec(Xe1, v1[k], cell, rho).reshape(24)
        for k in range(24)
    ], axis=1)  # Me (24, 24)
    M = lat.collapse_stencil(np.asarray(cols))
    mat = make_material({"type": "neohooke", "youngs": 500.0, "nue": 0.3,
                         "density": rho})
    f, _ = _oracle_force(disc, jnp.zeros(spec.ndof), mat)
    v = _rand_u(disc, seed=4)
    want = f.mass_matvec(v)
    got = lat.stencil_matvec_flat(M, v, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-12)


# -- pallas kernels (interpret mode on CPU) ---------------------------------


def test_pallas_stencil_interpret(box):
    disc, spec = box
    from fourc_tpu.materials.small_strain import LinearElastic
    from fourc_tpu.ops import lattice_pallas as lp

    lin = LinearElastic(youngs=200.0, nue=0.3)
    cell = get_cell("hex8")
    Xe1 = jnp.asarray(disc.coords[disc.blocks["hex8"].conn[:1]])
    Ke = sops.element_stiffness(Xe1, jnp.zeros_like(Xe1), cell, lin,
                                kinem="linear")[0]
    K = lat.collapse_stencil(np.asarray(Ke))
    v = _rand_u(disc, seed=5)
    want = lat.stencil_matvec_flat(K, v, spec)  # XLA ref on CPU
    got = lp.stencil_matvec_flat(K, v, spec, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)  # kernel runs f32


def test_pallas_force_jvp_interpret(box):
    disc, spec = box
    from fourc_tpu.ops import lattice_pallas as lp

    mat = make_material({"type": "neohooke", "youngs": 500.0, "nue": 0.3,
                         "density": 1.0})
    cell = get_cell("hex8")
    G, wdet = lat.uniform_geometry(cell, spec)
    u = _rand_u(disc, scale=5e-2, seed=1)
    v = _rand_u(disc, seed=2)
    from fourc_tpu.materials.elastic import lame

    lam, mu = (float(x) for x in lame(mat.youngs, mat.nue))
    ref_force = lat.make_force_flat(spec, cell, mat)  # XLA ref on CPU
    want_f = ref_force(u)
    _, want_jv = jax.jvp(ref_force, (u,), (v,))
    pf = lp.make_force_flat(spec, G, wdet, lam, mu, "neohooke",
                            interpret=True)
    got_f = pf(u)
    _, got_jv = jax.jvp(pf, (u,), (v,))
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got_jv), np.asarray(want_jv),
                               rtol=5e-4, atol=5e-5)


def test_pallas_fused_tangent_mass_interpret(box):
    """Fused K(u) v + c M v (one pass) == jvp of force + c * consistent
    mass stencil."""
    disc, spec = box

    mat = make_material({"type": "neohooke", "youngs": 500.0, "nue": 0.3,
                         "density": 2.0})
    cell = get_cell("hex8")
    u = _rand_u(disc, scale=5e-2, seed=3)
    v = _rand_u(disc, seed=4)
    mass_coef = 137.5  # excludes rho (folded inside make_tangent_flat)

    tangent = lat.make_tangent_flat(spec, cell, mat, mass_coef,
                                    interpret=True)
    got = tangent(u, v)

    ref_force = lat.make_force_flat(spec, cell, mat)  # XLA ref on CPU
    _, want_jv = jax.jvp(ref_force, (u,), (v,))
    # consistent-mass stencil from the collapsed element mass
    Xe1 = jnp.asarray(disc.coords[disc.blocks["hex8"].conn[:1]])
    cols = []
    for k in range(24):
        ve = jnp.zeros((1, 24)).at[:, k].set(1.0).reshape(1, 8, 3)
        cols.append(np.asarray(
            sops.consistent_mass_matvec(Xe1, ve, cell, 2.0)).reshape(24))
    Me = np.stack(cols, axis=1)
    Mv = lat.stencil_matvec_flat(lat.collapse_stencil(Me), v, spec)
    want = np.asarray(want_jv) + mass_coef * np.asarray(Mv)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_stencil_mxu_matches_ref(box):
    """im2col MXU stencil == scalar-FMA reference stencil (f32 cast)."""
    disc, spec = box
    rng = np.random.RandomState(7)
    B = rng.randn(24, 24)
    K = (B + B.T).reshape(8, 3, 8, 3)
    v = _rand_u(disc, seed=11)
    want = lat.from_lattice(
        lat.stencil_matvec_ref(K, lat.to_lattice(v, spec), spec), spec)
    got = lat.stencil_matvec_mxu(K, v, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)
