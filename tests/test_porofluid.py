"""Pressure-based multiphase porous flow tests.

Oracles mirror the reference's porofluid_pressure_based behavior
(ref: src/porofluid_pressure_based*): van Genuchten saturation closure,
single-phase Darcy limit, and monotone two-phase displacement.
"""

import jax.numpy as jnp
import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.materials import make_material
from fourc_tpu.physics import driver


def test_van_genuchten_closure():
    m = make_material({"type": "fluidporo_multiphase", "porosity": 0.3,
                       "permeability": 1.0, "vg_alpha": 2.0, "vg_n": 2.0,
                       "s_rw": 0.1})
    pcs = jnp.linspace(-1.0, 20.0, 100)
    sw = m.s_w(pcs)
    assert float(sw[0]) > 0.95  # pc <= 0: near full wetting saturation
    assert np.all(np.diff(np.asarray(sw)) <= 1e-12)  # monotone decreasing
    assert float(sw[-1]) < 0.2  # approaches residual


def test_single_phase_darcy_limit():
    """vg_alpha -> 0 keeps S_w ~ 1: the wetting equation is pure Darcy,
    steady state = linear pressure profile."""
    res = driver.run(dm.load("""
problem: {type: porofluidmultiphase}
porofluid_dynamic: {timestep: 100.0, numstep: 5, maxiter: 12, tolres: 1e-10}
solver: {method: gmres, precond: jacobi, maxiter: 2000, rtol: 1e-10,
         gmres_restart: 80}
functions:
  1: "t"
materials:
  1: {type: fluidporo_multiphase, porosity: 0.3, permeability: 1e-2,
      mu_w: 1.0, mu_n: 1.0, vg_alpha: 1e-6, vg_n: 2.0}
geometry:
  generator: {kind: rectangle, nx: 10, ny: 2, cell: quad4, mat: 1,
              lo: [0, 0], hi: [1, 0.2], name: porofluid}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1,1], val: [1.0, 1.0], funct: [0, 0]}
    - {nodes: xmax, onoff: [1,1], val: [0.0, 0.0]}
"""))
    f = res.fields["porofluid"].f
    x = np.asarray(f.disc.coords)
    p = np.asarray(res.states["porofluid"]["x"]).reshape(-1, 2)
    assert np.allclose(p[:, 0], 1.0 - x[:, 0], atol=1e-6)


def test_two_phase_drainage_monotone_front():
    """Non-wetting phase pushed in from x=0 (p_n raised): S_w drops near
    the inlet, profile monotone, bounds respected."""
    res = driver.run(dm.load("""
problem: {type: porofluidmultiphase}
porofluid_dynamic: {timestep: 0.05, numstep: 40, maxiter: 30, tolres: 1e-8}
solver: {method: gmres, precond: jacobi, maxiter: 2000, rtol: 1e-10,
         gmres_restart: 80}
functions:
  1: "t"
materials:
  1: {type: fluidporo_multiphase, porosity: 0.3, permeability: 1e-2,
      mu_w: 1.0, mu_n: 1.0, vg_alpha: 0.5, vg_n: 2.0, s_rw: 0.05,
      kr_exp: 2.0}
geometry:
  generator: {kind: rectangle, nx: 20, ny: 1, cell: quad4, mat: 1,
              lo: [0, 0], hi: [1, 0.05], name: porofluid}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1,1], val: [0.0, 3.0]}
    - {nodes: xmax, onoff: [1,0], val: [0.0, 0.0]}
"""))
    f = res.fields["porofluid"].f
    m = next(iter(f.block_mat.values()))
    x = np.asarray(f.disc.coords)
    p = np.asarray(res.states["porofluid"]["x"]).reshape(-1, 2)
    pc = p[:, 1] - p[:, 0]
    sw = np.asarray(m.s_w(jnp.asarray(pc)))
    order = np.argsort(x[:, 0])
    sw_line = sw[order][x[order, 1] < 1e-9]
    # invaded at inlet, still wet far away, monotone within tolerance
    assert sw_line[0] < 0.7
    assert sw_line[-1] > 0.9
    assert np.all(np.diff(sw_line) > -0.02)
    assert np.all((sw >= m.s_rw - 1e-9) & (sw <= 1.0 + 1e-9))
