"""Growth / mixture / active-muscle material tests.

Oracles mirror the reference's biological material family behavior
(ref: src/mat growthremodel_elasthyper, src/mixture, 4C_mat_muscle_*).
"""

import jax.numpy as jnp
import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.materials import make_material
from fourc_tpu.physics import driver


def test_mixture_rule_matches_weighted_modulus():
    """Two Neo-Hooke constituents at equal fractions == one Neo-Hooke at the
    mean modulus (NH stress is linear in the modulus at fixed nue)."""
    mix = make_material({"type": "mixture", "constituents": [
        {"frac": 0.5, "material": {"type": "neohooke", "youngs": 100.0,
                                   "nue": 0.3}},
        {"frac": 0.5, "material": {"type": "neohooke", "youngs": 300.0,
                                   "nue": 0.3}}]})
    ref = make_material({"type": "neohooke", "youngs": 200.0, "nue": 0.3})
    rng = np.random.default_rng(0)
    E = jnp.asarray(0.05 * (lambda A: (A + np.swapaxes(A, 0, 1)) / 2)(
        rng.standard_normal((3, 3, 4))))
    assert np.allclose(mix.pk2_from_E(E), ref.pk2_from_E(E), rtol=1e-12)


def test_isotropic_growth_reaches_homeostasis():
    """Clamped GP (C = I fixed): growth evolves theta until the Mandel
    stress trace hits the homeostatic target."""
    m = make_material({"type": "growth_iso", "youngs": 100.0, "nue": 0.3,
                       "k_growth": 5e-3, "m_target": -20.0})
    C = jnp.eye(3)
    h = jnp.asarray([1.0])
    trM = 0.0
    for _ in range(4000):
        S, h = m.evaluate(C, h, dt=1.0)
        theta = float(h[0])
        Ce = theta ** (-2 / 3) * C
        Ee = 0.5 * (Ce - jnp.eye(3))
        Se = m.elastic.pk2_from_E(Ee[..., None])[..., 0]
        trM = float(jnp.trace(Ce @ Se))
    assert theta > 1.0  # compressive target -> growth against the clamp
    assert abs(trM - (-20.0)) < 0.5, (theta, trM)


def test_muscle_active_contraction():
    """Free 1-element cube, fiber in x: ramped activation contracts it;
    at full activation eps_x ~ -smax/E (nue = 0, 1D stress balance)."""
    res = driver.run(dm.load("""
problem: {type: structure}
structural_dynamic: {dynamictype: statics, kinem: nonlinear, numstep: 5,
                     timestep: 0.5, maxiter: 20, tolres: 1e-10,
                     toldisp: 1e-10, normcombi: or}
solver: {method: direct}
functions:
  1: "t"
materials:
  1: {type: muscle_active, youngs: 1000.0, nue: 0.0, smax: 10.0, tau: 2.0,
      fiber: [1, 0, 0]}
geometry:
  generator: {kind: box, nx: 1, ny: 1, nz: 1, cell: hex8, mat: 1}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1,0,0], val: [0,0,0]}
    - {nodes: [0], onoff: [0,1,1], val: [0,0,0]}
    - {nodes: [2], onoff: [0,0,1], val: [0,0,0]}
"""))
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    x = np.asarray(f.disc.coords)
    ex = d[x[:, 0] > 0.5, 0].mean()  # x-strain of the unit cube
    assert ex < 0  # contracts
    assert abs(ex + 10.0 / 1000.0) < 2e-3, ex
