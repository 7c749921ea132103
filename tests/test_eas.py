"""EAS (enhanced assumed strain) element technology tests.

Oracles mirror the reference's EAS solid formulation
(ref: src/solid_3D_ele/4C_solid_3D_ele_calc_eas.hpp; decks with
`TECH eas_mild`): (1) patch test — under a spatially uniform strain the
enhancement must vanish (mode orthogonality), so EAS equals the
displacement-based element exactly; (2) in bending with coarse trilinear
bricks the standard hex8 shear-locks while EAS9 stays compliant.
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver
from tests.test_fbar import _bending_deck, _block_deck


def test_eas_patch_uniform_deformation():
    """Uniform uniaxial stretch: alpha -> 0, EAS == displacement-based."""
    r_std = driver.run(_block_deck("none", nue=0.3))
    r_eas = driver.run(_block_deck("eas_mild", nue=0.3))
    d_std = np.asarray(r_std.states["structure"]["d"])
    d_eas = np.asarray(r_eas.states["structure"]["d"])
    assert np.allclose(d_std, d_eas, atol=3e-6)


def test_eas_relieves_bending_locking():
    """Single-element-thick cantilever in bending: EAS9 deflects much more
    than the locked plain hex8 and lands near the fine-mesh answer."""
    r_std = driver.run(_bending_deck("none", nue=0.3))
    r_eas = driver.run(_bending_deck("eas_mild", nue=0.3))

    def tip_dz(res):
        f = res.fields["structure"].f
        d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
        return d[f.disc.node_sets["xmax"], 2].mean()

    w_std = tip_dz(r_std)
    w_eas = tip_dz(r_eas)
    # parasitic shear stiffness gone: substantially softer than plain hex8
    assert abs(w_eas) > 1.15 * abs(w_std)


def test_eas_element_force_consistency():
    """K from batched jvp of the EAS force must be symmetric at equilibrium
    of the local alpha solve for a hyperelastic law (condensed tangent of a
    potential)."""
    import jax
    import jax.numpy as jnp

    from fourc_tpu.core import cells, gridgen
    from fourc_tpu.materials import make_material
    from fourc_tpu.ops import solid as sops

    disc = gridgen.box(1, 1, 1, cell="hex8")
    cell = cells.get_cell("hex8")
    mat = make_material({"type": "neohooke", "youngs": 200.0, "nue": 0.3})
    Xe = jnp.asarray(disc.coords)[jnp.asarray(disc.blocks["hex8"].conn)]
    rng = np.random.default_rng(3)
    ue = jnp.asarray(0.02 * rng.standard_normal(Xe.shape))

    def f_of(u):
        f, _ = sops.internal_force(Xe, u.reshape(Xe.shape), cell, mat,
                                   kinem="nonlinear", tech="eas_mild")
        return f.reshape(-1)

    K = jax.jacfwd(f_of)(ue.reshape(-1))
    assert np.allclose(K, K.T, atol=1e-4 * float(jnp.abs(K).max()))
