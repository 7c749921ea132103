"""NURBS/B-spline discretization tests.

Oracles mirror what the reference's nurbs_discretization guarantees
(ref: src/core/fem/src/nurbs_discretization): partition of unity, exact
polynomial reproduction up to the degree, and a converged patch solve.
"""

import numpy as np

from fourc_tpu.core import cells, nurbs
from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def test_basis_partition_of_unity_and_linear_precision():
    for p in (2, 3):
        d = nurbs.patch_rectangle(4, 3, degree=p, lo=(0, 0), hi=(2, 1),
                                  name=f"pu{p}")
        X = np.asarray(d.coords)
        for key, blk in d.blocks.items():
            c = cells.get_cell(key)
            assert np.abs(c.N.sum(axis=1) - 1.0).max() < 1e-12
            # linear precision: sum_a N_a x_a reproduces the geometry map,
            # d(x)/dxi consistent with the span width
            Xe = X[blk.conn]  # (e, nen, 2)
            xg = np.einsum("ga,ead->egd", c.N, Xe)
            assert np.all(xg[:, :, 0] >= -1e-12)
            assert np.all(xg[:, :, 0] <= 2 + 1e-12)


def test_quadratic_bspline_reproduces_x_squared():
    """Stationary diffusion, D=1, source s = -2, u(0)=0, u(1)=1 ->
    u = x^2 exactly representable by p=2 B-splines: Galerkin gives the
    exact solution (superconvergence oracle)."""
    res = driver.run(dm.load("""
problem: {type: scatra}
scatra_dynamic: {dynamictype: stationary, numstep: 1, timestep: 1.0,
                 maxiter: 8, tolres: 1e-9, toldisp: 1e-8, normcombi: or}
solver: {method: cg, precond: jacobi, maxiter: 2000, rtol: 1e-12}
functions:
  1: "0 - 2.0"
materials:
  1: {type: scatra, diffusivity: 1.0}
geometry:
  generator: {kind: nurbs_patch, nx: 5, ny: 3, degree: 2, name: scatra}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1], val: [0.0]}
    - {nodes: xmax, onoff: [1], val: [1.0]}
  body_force:
    - {val: [1.0], funct: [1]}
"""))
    f = res.fields["scatra"].f
    phi = np.asarray(res.states["scatra"]["phi"])
    X = np.asarray(f.disc.coords)
    # evaluate u at all Gauss points of all spans and compare to x^2
    err = 0.0
    for key in f.dofmap.blocks:
        c = cells.get_cell(key)
        conn = np.asarray(f.dofmap.blocks[key].conn)
        u_g = np.einsum("ga,ea->eg", c.N, phi[conn])
        x_g = np.einsum("ga,ea->eg", c.N, X[conn][:, :, 0])
        err = max(err, np.abs(u_g - x_g**2).max())
    assert err < 1e-8, err
