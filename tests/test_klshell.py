"""Kirchhoff-Love NURBS shell (rotation-free isogeometric shell).

ref: src/shell_kl_nurbs (Kiendl KL shell on NURBS patches).

Oracles:
- membrane patch test: uniaxial stretch of a flat sheet is EXACT (linear
  in-plane solution lies in the spline space)
- bending: clamped plate strip under end line load matches the
  Euler-Bernoulli tip deflection P L^3 / (3 E I), I = t^3/12 per unit
  width, within a few % (p=3 spline, pure KL kinematics: no shear)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourc_tpu.core.conditions import DirichletBC, PointNeumannBC
from fourc_tpu.ops import klshell as kls
from fourc_tpu.physics import beam as pb
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics.shell import KLShellField


def _params():
    p = ps.SolidParams(dyntype="statics")
    p.newton.tol_res = 1e-10
    p.newton.tol_disp = 1e-12
    p.newton.max_iter = 40
    p.newton.lin_rtol = 1e-12
    p.newton.lin_maxiter = 4000
    return p


def test_ders_basis_partition_of_unity():
    from fourc_tpu.core.nurbs import open_knot_vector

    p = 3
    U = open_knot_vector(5, p)
    for span in range(5):
        for u in (U[span + p] + 1e-4, 0.5 * (U[span + p] + U[span + p + 1])):
            d = kls.ders_basis_1d(p, U, span, u)
            assert abs(d[0].sum() - 1.0) < 1e-12
            assert abs(d[1].sum()) < 1e-10  # derivative of PU = 0
            assert abs(d[2].sum()) < 1e-8


def test_membrane_patch_exact():
    patch = kls.build_kl_patch(3, 2, degree=2)
    E, nu, t = 100.0, 0.3, 0.02
    mat = {"youngs": E, "nue": nu, "thickness": t}
    ns = patch["node_sets"]
    X = patch["coords"]
    pull = 0.05
    dbc = [
        DirichletBC(ns["xmin"], [1, 0, 0], [0, 0, 0]),
        DirichletBC(ns["xmax"], [1, 0, 0], [pull, 0, 0]),
        DirichletBC(ns["all"], [0, 0, 1], [0, 0, 0]),  # stay flat
        DirichletBC(np.asarray([0]), [0, 1, 0], [0, 0, 0]),
    ]
    f = KLShellField(patch, mat, _params(), dirichlet=dbc)
    state = ps.compute_initial_state(f, pb.init_state(f))
    step = pb.make_step(f, dt=1.0)
    state, stats = step(state)
    d = np.asarray(state["d"]).reshape(-1, 3)
    # exact membrane solution: u_x = pull * x, u_y = -nu * pull * y + c
    ux_err = np.abs(d[:, 0] - pull * X[:, 0]).max()
    assert ux_err < 1e-8, ux_err
    # lateral contraction ratio (free edges): strain_y / strain_x = -nu
    eps_y = (d[np.asarray(ns["ymax"]), 1].mean()
             - d[np.asarray(ns["ymin"]), 1].mean())
    # SVK plane stress at finite strain: E_yy = -nu E_xx (Green strains),
    # lam_y = sqrt(1 + 2 E_yy)
    Exx = 0.5 * ((1 + pull) ** 2 - 1.0)
    lam_y = np.sqrt(1.0 - 2.0 * nu * Exx)
    assert eps_y == pytest.approx(lam_y - 1.0, rel=1e-6)


def test_plate_strip_bending_cantilever():
    L, W, t = 1.0, 0.2, 0.02
    E, nu = 1.0e4, 0.0  # nu = 0: strip behaves as Euler-Bernoulli beam
    patch = kls.build_kl_patch(8, 1, degree=3, u_vec=(L / 1.0, 0, 0),
                               v_vec=(0, W, 0))
    # scale: greville in [0,1] scaled by u_vec -> plate is L x W
    mat = {"youngs": E, "nue": nu, "thickness": t}
    ns = patch["node_sets"]
    # clamped edge: fix first TWO control point rows (KL clamping condition
    # fixes value + normal slope through the spline control net)
    dbc = [
        DirichletBC(ns["xmin"], [1, 1, 1], [0, 0, 0]),
        DirichletBC(ns["xmin2"], [1, 1, 1], [0, 0, 0]),
    ]
    Ptot = 8.0e-5  # keep the tip deflection in the linear regime
    tip = ns["xmax"]
    neu = [PointNeumannBC(np.asarray(tip), [0, 0, 1],
                          [0, 0, Ptot / len(tip)])]
    f = KLShellField(patch, mat, _params(), dirichlet=dbc,
                     point_neumann=neu)
    state = ps.compute_initial_state(f, pb.init_state(f))
    step = pb.make_step(f, dt=1.0)
    state, stats = step(state)
    d = np.asarray(state["d"]).reshape(-1, 3)
    w_tip = d[np.asarray(tip), 2].mean()
    I = W * t**3 / 12.0
    w_ref = Ptot * L**3 / (3.0 * E * I)
    assert w_tip == pytest.approx(w_ref, rel=0.05), (w_tip, w_ref)
