"""Immersed-boundary FSI (general immersed solid in an Eulerian fluid).

Oracle: a soft elastic block held at its base, immersed mid-channel, acts
as an obstacle — the direct-forcing constraint pulls the fluid velocity at
the solid toward the solid velocity (~0), producing a wake deficit, and
the reaction bends the block downstream (ref capability:
src/immersed_problem — ImmersedPartitionedFSIDirichletNeumann).
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

U = 1.0


def _deck(inflow, penalty=200.0, numstep=6, youngs=50.0):
    return dm.load(f"""
problem: {{type: immersed_fsi}}
immersed_dynamic: {{timestep: 0.25, numstep: {numstep}, penalty: {penalty}}}
structural_dynamic: {{maxiter: 15, tolres: 1e-9, toldisp: 1e-10,
                     normcombi: or}}
fluid_dynamic: {{dynamictype: onesteptheta, theta: 1.0, tolres: 1e-8,
                toldisp: 1e-9}}
solver: {{method: gmres, precond: jacobi, maxiter: 3000, gmres_restart: 100}}
functions:
  1: "{inflow}"
materials:
  1: {{type: newtonianfluid, viscosity: 0.05, density: 1.0}}
  2: {{type: neohooke, youngs: {youngs}, nue: 0.3, density: 1.0}}
geometry:
  generator:
    - {{kind: rectangle, nx: 12, ny: 8, cell: quad4, mat: 1, name: fluid,
        lo: [0, 0], hi: [3, 1]}}
    - {{kind: rectangle, nx: 2, ny: 4, cell: quad4, mat: 2, name: structure,
        lo: [0.9, 0.02], hi: [1.1, 0.5]}}
conditions:
  dirichlet:
    - {{field: fluid, nodes: xmin, onoff: [1,1,0], val: [{U}, 0, 0],
        funct: [1, 0, 0]}}
    - {{field: fluid, nodes: ymin, onoff: [0,1,0], val: [0,0,0]}}
    - {{field: fluid, nodes: ymax, onoff: [0,1,0], val: [0,0,0]}}
    - {{field: structure, nodes: ymin, onoff: [1,1], val: [0,0]}}
""")


def test_immersed_block_obstructs_and_bends():
    res = driver.run(_deck(inflow=1.0))
    f = res.fields["fluid"].f
    x = np.asarray(res.states["fluid"]["x"]).reshape(-1, f.ndpn)
    X = np.asarray(f.disc.coords)
    # wake deficit: u_x inside/behind the block well below free stream above
    inside = (X[:, 0] > 0.85) & (X[:, 0] < 1.15) & (X[:, 1] < 0.5) \
        & (X[:, 1] > 0.05)
    above = (X[:, 0] > 0.85) & (X[:, 0] < 1.15) & (X[:, 1] > 0.7)
    assert x[inside, 0].mean() < 0.5 * x[above, 0].mean()
    # the block bends downstream (positive x displacement at the top)
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 2)
    Xs = np.asarray(res.fields["structure"].f.disc.coords)
    top = Xs[:, 1] > 0.4
    assert d[top, 0].mean() > 1e-4
    assert d[top, 0].mean() < 0.5  # bounded (not blown up)


def test_immersed_constraint_tightens_with_penalty():
    """The IB velocity constraint residual |u_f(X_s) - v_s| shrinks as the
    direct-forcing penalty grows (weak -> strong interface Dirichlet)."""
    from fourc_tpu.physics.immersed_driver import pair_points_bvh

    errs = []
    for pen in (50.0, 800.0):
        res = driver.run(_deck(inflow=1.0, penalty=pen, numstep=3,
                               youngs=5000.0))
        f = res.fields["fluid"].f
        x = np.asarray(res.states["fluid"]["x"]).reshape(-1, f.ndpn)
        Xs = np.asarray(res.fields["structure"].f.disc.coords)[:, :2]
        ds = np.asarray(res.states["structure"]["d"]).reshape(-1, 2)
        vs = np.asarray(res.states["structure"]["v"]).reshape(-1, 2)
        fconn = np.asarray(
            next(iter(f.dofmap.blocks.values())).conn)
        host, wts = pair_points_bvh(Xs + ds, f.disc.coords, fconn)
        sel = host >= 0
        uf = np.einsum("bk,bkd->bd", wts[sel],
                       x[:, :2][fconn[host[sel]]])
        errs.append(np.linalg.norm(uf - vs[sel], axis=1).mean())
    assert errs[1] < 0.35 * errs[0]


def test_immersed_no_flow_no_motion():
    res = driver.run(_deck(inflow=0.0, numstep=2))
    assert np.abs(np.asarray(res.states["structure"]["d"])).max() < 1e-8
