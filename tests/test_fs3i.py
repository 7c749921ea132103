"""FS3I (FSI + two-field scalar transport) tests.

Oracle: membrane gas exchange — concentration transfers from the fluid to
the solid through the interface permeability, conserving total mass in a
closed system (ref: src/fs3i partitioned permeability coupling).
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def _deck(perm, numstep=6):
    return dm.load(f"""
problem: {{type: fs3i}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  tolres: 1e-9
  toldisp: 1e-10
fluid_dynamic:
  dynamictype: onesteptheta
  theta: 1.0
  tolres: 1e-9
  toldisp: 1e-10
scatra_dynamic: {{dynamictype: onesteptheta, theta: 1.0}}
fsi_dynamic: {{timestep: 0.5, numstep: {numstep}, convtol: 1e-8, itemax: 25}}
fs3i_dynamic: {{permeability: {perm}, scatra_mat_fluid: 3,
               scatra_mat_structure: 4, c0_fluid: 1.0, tolres: 1e-10}}
solver: {{method: gmres, precond: jacobi, maxiter: 3000, gmres_restart: 120}}
materials:
  1: {{type: newtonianfluid, viscosity: 0.1, density: 1.0}}
  2: {{type: stvenantkirchhoff, youngs: 1000.0, nue: 0.0}}
  3: {{type: scatra, diffusivity: 0.05}}
  4: {{type: scatra, diffusivity: 0.02}}
geometry:
  generator:
    - {{kind: rectangle, nx: 5, ny: 5, cell: quad4, mat: 1, name: fluid}}
    - {{kind: rectangle, nx: 5, ny: 5, cell: quad4, mat: 2, name: structure,
        lo: [1, 0], hi: [2, 1]}}
conditions:
  dirichlet:
    - {{field: fluid, nodes: xmin, onoff: [1,1,0], val: [0,0,0]}}
    - {{field: fluid, nodes: ymin, onoff: [1,1,0], val: [0,0,0]}}
    - {{field: fluid, nodes: ymax, onoff: [1,1,0], val: [0,0,0]}}
    - {{field: fluid, nodes: [0], onoff: [0,0,1], val: [0,0,0]}}
    - {{field: structure, nodes: xmax, onoff: [1,1], val: [0,0]}}
    - {{field: structure, nodes: ymin, onoff: [0,1], val: [0,0]}}
    - {{field: structure, nodes: ymax, onoff: [0,1], val: [0,0]}}
  fsi_interface:
    - {{structure: xmin, fluid: xmax}}
""")


def _masses(res):
    import jax.numpy as jnp

    v = res.fields["fs3i"]
    cf = jnp.asarray(res.states["fs3i"]["cf"])
    cs = jnp.asarray(res.states["fs3i"]["cs"])
    mf = float(jnp.sum(v.sca_f.lumped_capacity() * cf))
    ms = float(jnp.sum(v.sca_s.lumped_capacity() * cs))
    return mf, ms


def test_fs3i_membrane_transfer_conserves_mass():
    res = driver.run(_deck(perm=0.5))
    mf, ms = _masses(res)
    assert ms > 1e-3  # gas crossed the membrane
    assert abs(mf + ms - 1.0) < 1e-6  # closed system: total conserved
    # fluid side depleted accordingly
    assert mf < 1.0


def test_fs3i_zero_permeability_no_transfer():
    res = driver.run(_deck(perm=0.0, numstep=3))
    mf, ms = _masses(res)
    assert abs(ms) < 1e-12
    assert abs(mf - 1.0) < 1e-8
