"""Volume-mortar projection between non-matching hex meshes.

ref: src/coupling/src/volmortar (VolMortarCoupl P = D^-1 M).

Oracles: constants and LINEAR fields project exactly between non-matching
meshes (lumped-mortar completeness); force transfer is conservative
(sums preserved).
"""

import jax.numpy as jnp
import numpy as np

from fourc_tpu.core import gridgen
from fourc_tpu.coupling.volmortar import VolMortar


def test_linear_completeness():
    src = gridgen.box(3, 3, 3)
    tgt = gridgen.box(5, 4, 2)
    P = VolMortar(src, tgt)
    Xs = np.asarray(src.coords)
    Xt = np.asarray(tgt.coords)
    lin = lambda X: 2.0 + 0.5 * X[:, 0] - 1.25 * X[:, 1] + 3.0 * X[:, 2]
    out = np.asarray(P.project(jnp.asarray(lin(Xs))))
    np.testing.assert_allclose(out, lin(Xt), rtol=1e-10, atol=1e-10)
    # constants too
    out1 = np.asarray(P.project(jnp.ones(Xs.shape[0])))
    np.testing.assert_allclose(out1, 1.0, rtol=1e-12)


def test_vector_field_and_conservative_transfer():
    src = gridgen.box(2, 2, 2)
    tgt = gridgen.box(3, 3, 3)
    P = VolMortar(src, tgt)
    Xs = np.asarray(src.coords)
    vec = jnp.asarray(np.stack([Xs[:, 0], -Xs[:, 1], 0.5 * Xs[:, 2]], 1))
    out = np.asarray(P.project(vec))
    Xt = np.asarray(tgt.coords)
    np.testing.assert_allclose(out, np.stack(
        [Xt[:, 0], -Xt[:, 1], 0.5 * Xt[:, 2]], 1), atol=1e-10)
    # force transfer preserves the total
    f_t = jnp.asarray(np.random.default_rng(0).normal(size=(Xt.shape[0], 3)))
    f_s = np.asarray(P.transfer_forces(f_t))
    np.testing.assert_allclose(f_s.sum(axis=0), np.asarray(f_t).sum(axis=0),
                               rtol=1e-10)
