"""Level-set transport + reinitialization tests.

Oracles (ref: src/levelset semantics): a circle advected by rigid
rotation returns to its start (area preserved), and reinitialization
restores the signed-distance property |grad phi| ~ 1.
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

R0 = 0.15


def _deck(numstep, reinit_every=8):
    # rigid rotation about (0.5, 0.5); full revolution T = 1
    return dm.load(f"""
problem: {{type: levelset}}
scatra_dynamic:
  dynamictype: onesteptheta
  theta: 0.5
  timestep: {1.0 / 128}
  numstep: {numstep}
  tolres: 5e-4
  toldisp: 1e-9
  normcombi: or
  initialfield_funct: 1
  velocity: ["(0.5 - y) * 2 * pi", "(x - 0.5) * 2 * pi"]
levelset_dynamic: {{reinit_every: {reinit_every}, reinit_sweeps: 8}}
solver: {{method: bicgstab, maxiter: 2000, rtol: 1e-10}}
functions:
  1: "sqrt((x - 0.5)^2 + (y - 0.72)^2) - {R0}"
materials:
  1: {{type: scatra, diffusivity: 0.0}}
geometry:
  generator: {{kind: rectangle, nx: 48, ny: 48, cell: quad4, mat: 1,
               lo: [0, 0], hi: [1, 1], name: levelset}}
"""
    )


def _area(res):
    phi = np.asarray(res.states["levelset"]["phi"])
    h = 1.0 / 48
    return float(np.sum(phi < 0) * h * h)


def test_levelset_rotation_returns_and_conserves_area():
    res = driver.run(_deck(numstep=128))  # one full revolution
    f = res.fields["levelset"].f
    phi = np.asarray(res.states["levelset"]["phi"])
    X = np.asarray(f.disc.coords)
    ref = np.sqrt((X[:, 0] - 0.5) ** 2 + (X[:, 1] - 0.72) ** 2) - R0
    # interface back at the start: sign pattern matches the initial circle
    mism = np.mean((phi < 0) != (ref < 0))
    assert mism < 0.08, mism
    # area drift bounded
    a = _area(res)
    assert abs(a - np.pi * R0**2) < 0.35 * np.pi * R0**2


def test_reinitialization_restores_signed_distance():
    import jax.numpy as jnp

    from fourc_tpu.physics.levelset_driver import (nodal_gradient,
                                                   reinitialize)
    from fourc_tpu.physics import scalar_driver

    deck = _deck(numstep=1)
    f = scalar_driver.build_field(deck, "scatra_dynamic", "levelset")
    X = np.asarray(f.disc.coords)
    d = np.sqrt((X[:, 0] - 0.5) ** 2 + (X[:, 1] - 0.5) ** 2) - 0.2
    phi_bad = jnp.asarray(3.0 * d)  # distorted: |grad| = 3
    phi = reinitialize(f, phi_bad, n_sweeps=60)
    g = nodal_gradient(f, phi)
    gm_band = np.asarray(jnp.sqrt(jnp.sum(g * g, 1)))
    band = np.abs(d) < 0.1  # near the interface
    assert abs(np.median(gm_band[band]) - 1.0) < 0.15
    # zero level set unchanged
    assert np.mean((np.asarray(phi) < 0) != (d < 0)) < 0.01
