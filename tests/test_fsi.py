"""ALE mesh motion + partitioned FSI tests.

Hydrostatic piston oracle: a still fluid column under body force presses
an elastic block; interface pressure p = rho*G*L_f, block compression
delta = p*L_s/E.  (Reference analog: simple FSI verification decks,
ref: tests/input_files/fsi_*.dat semantics.)
"""

import numpy as np
import pytest

from fourc_tpu.core import gridgen
from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def test_ale_harmonic_interpolation():
    """Laplace smoothing of a uniform interface shift is linear in x."""
    import jax.numpy as jnp

    from fourc_tpu.physics.ale import AleField

    disc = gridgen.rectangle(8, 4, cell="quad4", name="fluid")
    iface = disc.node_sets["xmax"]
    bnd = np.unique(np.concatenate([disc.node_sets["xmin"]]))
    ale = AleField(disc, iface, bnd)
    disp = ale.solve(jnp.full((len(iface), 2), 0.0).at[:, 0].set(0.1))
    x = disc.coords[:, 0]
    assert np.abs(np.asarray(disp[:, 0]) - 0.1 * x).max() < 1e-7
    assert np.abs(np.asarray(disp[:, 1])).max() < 1e-9


G = 2.0
E_MOD = 1000.0


def _fsi_deck(numstep=1, dt=1.0):
    return dm.load(f"""
problem: {{type: fsi}}
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
fsi_dynamic: {{timestep: {dt}, numstep: {numstep}, convtol: 1e-9, itemax: 25}}
solver: {{method: gmres, precond: jacobi, maxiter: 3000, gmres_restart: 120}}
materials:
  1: {{type: newtonianfluid, viscosity: 0.1, density: 1.0}}
  2: {{type: stvenantkirchhoff, youngs: {E_MOD}, nue: 0.0}}
geometry:
  generator:
    - {{kind: rectangle, nx: 6, ny: 6, cell: quad4, mat: 1, name: fluid}}
    - {{kind: rectangle, nx: 6, ny: 6, cell: quad4, mat: 2, name: structure,
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
  body_force:
    - {{field: fluid, val: [{G}, 0]}}
  fsi_interface:
    - {{structure: xmin, fluid: xmax}}
""")


def test_fsi_hydrostatic_piston():
    # a few steps let the ALE/flow transients settle to the steady state
    res = driver.run(_fsi_deck(numstep=3, dt=1.0))
    f_s = res.fields["structure"].f
    f_f = res.fields["fluid"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 2)
    Xs = f_s.disc.coords

    # fluid: at rest, hydrostatic pressure p = rho G x
    xn = np.asarray(res.states["fluid"]["x"]).reshape(-1, 3)
    xf = f_f.disc.coords[:, 0]
    assert np.abs(xn[:, :2]).max() < 2e-3  # (nearly) still fluid
    assert np.abs(xn[:, 2] - G * xf).max() < 0.05  # linear pressure

    # structure: uniform compression sigma = p(1) = G
    p_if = G * 1.0
    delta = p_if * 1.0 / E_MOD  # 0.002
    iface_nodes = f_s.disc.node_sets["xmin"]
    u_if = d[iface_nodes, 0]
    assert u_if.std() < 1e-4
    assert u_if.mean() == pytest.approx(delta, rel=0.03)
    # linear displacement profile through the block
    assert np.abs(d[:, 0] - delta * (2.0 - Xs[:, 0])).max() < 2e-4


def test_ale_elastic_smoothing_preserves_quality():
    """Pseudo-elastic ALE with Jacobian stiffening: under a hard interface
    push the worst element stays healthier than with Laplace smoothing
    (ref: src/ale pseudo-elasticity ALE_TYPE)."""
    import jax.numpy as jnp

    from fourc_tpu.physics.ale import AleField

    def min_detj(disc, disp):
        from fourc_tpu.core.cells import get_cell
        from fourc_tpu.ops import common as gm

        x = np.asarray(disc.coords) + np.asarray(disp)
        conn = np.asarray(disc.blocks["quad4"].conn)
        cell = get_cell("quad4")
        G, detJ = gm.iso_gradients(jnp.asarray(x)[conn], cell.dN)
        return float(jnp.min(detJ))

    def run(method):
        disc = gridgen.rectangle(10, 5, cell="quad4", name="fluid")
        iface = disc.node_sets["xmax"]
        bnd = disc.node_sets["xmin"]
        ale = AleField(disc, iface, bnd, method=method)
        # LOCALIZED indentation: only the middle of the interface moves
        y = jnp.asarray(disc.coords[np.asarray(iface), 1])
        bump = jnp.exp(-((y - 0.5) / 0.15) ** 2)
        push = jnp.zeros((len(iface), 2)).at[:, 0].set(-0.55 * bump)
        return disc, ale.solve(push, maxiter=2000)

    d1, u_lap = run("laplace")
    d2, u_ela = run("elastic")
    q_lap = min_detj(d1, u_lap)
    q_ela = min_detj(d2, u_ela)
    # Jacobian stiffening keeps the worst cell healthier under the localized
    # indentation than plain harmonic smoothing
    assert q_ela > q_lap
    # uniform shift exactness for the elastic smoother
    disc = gridgen.rectangle(6, 3, cell="quad4", name="fluid")
    ale = AleField(disc, disc.node_sets["xmax"], disc.node_sets["xmin"],
                   method="elastic")
    u = ale.solve(jnp.zeros((len(disc.node_sets["xmax"]), 2)).at[:, 0].set(0.1),
                  maxiter=2000)
    x = disc.coords[:, 0]
    assert np.abs(np.asarray(u[:, 0]) - 0.1 * x).max() < 1e-6
