"""FE² multiscale (micromaterial) tests.

Oracle mirrors the reference's micro-macro consistency: a homogeneous RVE
must homogenize to exactly the micro material's own response
(ref: src/mat/4C_mat_micromaterial.hpp, src/stru_multi/4C_stru_multi_microstatic.cpp).
"""

import jax.numpy as jnp
import numpy as np

from fourc_tpu.materials import make_material
from fourc_tpu.materials.multiscale import _sqrtm_spd


def test_sqrtm_spd_repeated_eigenvalues():
    C = jnp.asarray(np.diag([4.0, 1.0, 1.0]))
    U = _sqrtm_spd(C)
    assert np.allclose(U, np.diag([2.0, 1.0, 1.0]), atol=1e-10)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((3, 3))
    C = jnp.asarray(B @ B.T + 3 * np.eye(3))
    U = _sqrtm_spd(C)
    assert np.allclose(U @ U, C, atol=1e-9)


def test_homogeneous_rve_reproduces_micro_material():
    nh = make_material({"type": "neohooke", "youngs": 100.0, "nue": 0.3})
    fe2 = make_material({"type": "micromaterial",
                         "micro": {"type": "neohooke", "youngs": 100.0,
                                   "nue": 0.3},
                         "nx": 2})

    # batch of GL strains: uniaxial + shear + random symmetric (small)
    rng = np.random.default_rng(1)
    Es = [np.diag([0.05, 0.0, 0.0]),
          np.array([[0, 0.03, 0], [0.03, 0, 0], [0, 0, 0]]),
          0.02 * (lambda A: (A + A.T) / 2)(rng.standard_normal((3, 3)))]
    E = jnp.asarray(np.stack(Es, axis=-1))  # (3, 3, M)

    S_direct = nh.pk2_from_E(E)
    S_fe2 = fe2.pk2_from_E(E)
    assert np.allclose(S_fe2, S_direct, rtol=2e-4,
                       atol=2e-4 * float(jnp.abs(S_direct).max()))


def test_fe2_in_solid_field():
    """One-element macro cube with an FE² material solves a uniaxial
    stretch to the same displacement as the direct micro material."""
    from fourc_tpu.io import deck as dm
    from fourc_tpu.physics import driver

    def deck(mat_yaml):
        return dm.load(f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: statics, kinem: nonlinear, numstep: 1,
                     timestep: 1.0, maxiter: 12, tolres: 1e-9, toldisp: 1e-10}}
solver: {{method: direct}}
functions:
  1: "t"
materials:
  1: {mat_yaml}
geometry:
  generator: {{kind: box, nx: 1, ny: 1, nz: 1, cell: hex8, mat: 1}}
conditions:
  dirichlet:
    - {{nodes: zmin, onoff: [0,0,1], val: [0,0,0]}}
    - {{nodes: zmax, onoff: [0,0,1], val: [0,0,0.05], funct: [0,0,1]}}
    - {{nodes: [0], onoff: [1,1,0], val: [0,0,0]}}
    - {{nodes: [1], onoff: [0,1,0], val: [0,0,0]}}
""")

    r_nh = driver.run(deck("{type: neohooke, youngs: 100.0, nue: 0.3}"))
    r_fe2 = driver.run(deck(
        "{type: micromaterial, nx: 2, micro: {type: neohooke, youngs: 100.0, nue: 0.3}}"))
    d_nh = np.asarray(r_nh.states["structure"]["d"])
    d_fe2 = np.asarray(r_fe2.states["structure"]["d"])
    assert np.allclose(d_fe2, d_nh, atol=5e-5)
