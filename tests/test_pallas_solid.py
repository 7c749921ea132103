"""Fused Pallas hex8 solid kernel tests (interpret mode on CPU).

The kernel (ops/solid_pallas.py) must agree with the reference einsum
implementation to f32 roundoff for both the internal force and the
Newton-Krylov tangent matvec (custom jvp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourc_tpu.core import cells, gridgen
from fourc_tpu.materials import make_material
from fourc_tpu.ops import solid as sops
from fourc_tpu.ops import solid_pallas as spk


@pytest.mark.parametrize("mtype", ["neohooke", "stvenantkirchhoff"])
def test_pallas_matches_einsum(mtype):
    disc = gridgen.box(4, 4, 4)
    cell = cells.get_cell("hex8")
    conn = jnp.asarray(np.asarray(disc.blocks["hex8"].conn))
    X = jnp.asarray(disc.coords, jnp.float32)
    rng = np.random.default_rng(0)
    u = jnp.asarray(0.02 * rng.standard_normal((disc.n_nodes, 3)), jnp.float32)
    v = jnp.asarray(0.01 * rng.standard_normal((disc.n_nodes, 3)), jnp.float32)
    Xe, ue, ve = X[conn], u[conn], v[conn]
    mat = make_material({"type": mtype, "youngs": 1e3, "nue": 0.3})

    f_ref, _ = sops.internal_force(Xe, ue, cell, mat, kinem="nonlinear",
                                   impl="einsum")
    f_pal = spk.internal_force(Xe, ue, mat, interpret=True)
    scale = float(jnp.abs(f_ref).max())
    assert float(jnp.abs(f_pal - f_ref).max()) < 3e-6 * scale

    def pal(uu):
        return spk.internal_force(Xe, uu, mat, interpret=True)

    def ref(uu):
        return sops.internal_force(Xe, uu, cell, mat, kinem="nonlinear",
                                   impl="einsum")[0]

    _, jp = jax.jvp(pal, (ue,), (ve,))
    _, jr = jax.jvp(ref, (ue,), (ve,))
    assert float(jnp.abs(jp - jr).max()) < 3e-6 * float(jnp.abs(jr).max())


def test_pallas_pad_and_model_dispatch():
    # non-multiple-of-TILE element count exercises the padding path
    disc = gridgen.box(3, 2, 2)
    conn = jnp.asarray(np.asarray(disc.blocks["hex8"].conn))
    X = jnp.asarray(disc.coords, jnp.float32)
    mat = make_material({"type": "neohooke", "youngs": 1e3, "nue": 0.3})
    f = spk.internal_force(X[conn], 0.01 * X[conn], mat, interpret=True)
    assert f.shape == (12, 8, 3)
    assert np.all(np.isfinite(np.asarray(f)))
    # unsupported material -> no pallas model
    visc = make_material({"type": "plasticnlnlogneohooke", "youngs": 1e3,
                          "nue": 0.3, "yield_stress": 1.0})
    assert spk.pallas_model_for(visc) is None
