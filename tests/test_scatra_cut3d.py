"""Moving-interface scalar transport on the 3D cut engine.

ref: src/scatra levelset/xfem transport on cut domains + src/cut.

Oracles:
- constancy: theta0 = g = const is an EXACT solution of the discrete
  backward-Euler CutFEM system on any moving domain (mass, stiffness and
  Nitsche terms all consistent) — must hold to solver precision while a
  sphere shrinks under the quadrature's feet
- decay rate: on a FIXED embedded sphere with theta = 0 on the boundary,
  the slowest mode decays at lambda_1 = kappa (pi/r)^2; the measured
  log-slope must match within mesh accuracy
- translating sphere: the active set follows the interface and the field
  stays bounded by the maximum principle (source-free)
"""

import numpy as np
import pytest

from fourc_tpu.core import gridgen
from fourc_tpu.cut.scatra_cut3d import step_scatra_cut3d


def _mesh(n):
    d = gridgen.box(n, n, n, cell="hex8")
    return np.asarray(d.coords), np.asarray(d.blocks["hex8"].conn)


def test_constant_exact_on_shrinking_sphere():
    X, conn = _mesh(8)
    c = 1.7
    th = np.full(X.shape[0], c)
    for k, r0 in enumerate((0.42, 0.38, 0.34, 0.30)):
        phi = np.linalg.norm(X - 0.5, axis=1) - r0  # inside the sphere
        th, cm = step_scatra_cut3d(X, conn, phi, th, dt=0.1, kappa=0.7,
                                   g_dirichlet=lambda x, y, z, t=0: c)
        # exact up to the sliver-guarded system's conditioning (~1e-9)
        assert np.abs(th - c).max() < 1e-7, (k, np.abs(th - c).max())


def test_decay_rate_fixed_sphere():
    X, conn = _mesh(12)
    r0 = 0.41
    kappa = 0.05
    phi = np.linalg.norm(X - 0.5, axis=1) - r0
    th = np.where(phi < 0, 1.0, 0.0).astype(float)
    dt = 0.05
    norms = []
    cm = None
    for _ in range(14):
        th, cm = step_scatra_cut3d(X, conn, phi, th, dt=dt, kappa=kappa)
        norms.append(np.abs(th[cm.active_nodes]).max())
    # after the initial transient the slowest mode dominates:
    # theta ~ exp(-lambda_1 t), lambda_1 = kappa (pi/r)^2
    lam_meas = np.log(norms[-4] / norms[-1]) / (3 * dt)
    lam_want = kappa * (np.pi / r0) ** 2
    assert lam_meas == pytest.approx(lam_want, rel=0.15), (lam_meas, lam_want)


def test_translating_sphere_active_set_follows():
    X, conn = _mesh(10)
    th = np.zeros(X.shape[0])
    th[:] = 0.5
    centers = []
    for k in range(5):
        cx = 0.35 + 0.06 * k
        phi = np.linalg.norm(X - np.array([cx, 0.5, 0.5]), axis=1) - 0.22
        th, cm = step_scatra_cut3d(
            X, conn, phi, th, dt=0.1, kappa=0.2,
            g_dirichlet=lambda x, y, z, t=0: 0.5)
        act_centroid = X[cm.active_nodes].mean(axis=0)
        centers.append(act_centroid[0])
        # maximum principle (source-free, boundary at 0.5, init 0.5)
        assert np.abs(th - 0.5).max() < 1e-6
    # the active set's centroid tracks the moving sphere center
    assert centers[-1] - centers[0] > 0.15, centers
