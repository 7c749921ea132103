"""General-geometry wide lattice kernels vs the reference einsum path.

The round-4 unstructured-performance path: lattice-TOPOLOGY meshes with
arbitrary node positions run the relayout-free wide Newton loop with
per-element jacobians computed in-kernel (ops/lattice_pallas.py
_force_kernel_gen / _jvp_kernel_gen).  Correctness anchor: the general
einsum element force (ops/solid.py) on the same jittered box.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourc_tpu.core import cells, gridgen
from fourc_tpu.materials import make_material
from fourc_tpu.ops import lattice as lat
from fourc_tpu.ops import lattice_pallas as lp
from fourc_tpu.ops import solid as sops


def _jittered_box(n=3, amp=0.3):
    disc = gridgen.box(n, n, n, cell="hex8")
    X = np.array(disc.coords)
    rng = np.random.RandomState(3)
    h = 1.0 / n
    interior = np.all((X > 1e-12) & (X < 1.0 - 1e-12), axis=1)
    X[interior] += (rng.rand(int(interior.sum()), 3) - 0.5) * (amp * h)
    disc.coords = X
    disc.structured_shape = None
    return disc


def _reference_force(disc, u, mat, kinem="nonlinear"):
    cell = cells.get_cell("hex8")
    conn = np.asarray(next(iter(disc.blocks.values())).conn)
    Xe = jnp.asarray(disc.coords)[conn]
    ue = u.reshape(-1, 3)[conn]
    fe, _ = sops._internal_force_einsum(Xe, ue, cell, mat, kinem=kinem)
    out = np.zeros((disc.n_nodes, 3))
    np.add.at(out, conn.reshape(-1), np.asarray(fe).reshape(-1, 3))
    return out.reshape(-1)


@pytest.mark.parametrize("model", ["neohooke", "svk"])
def test_general_wide_force_matches_einsum(model):
    disc = _jittered_box(3)
    spec = lat.LatticeSpec(pshape=(4, 4, 4), h=(1 / 3,) * 3)
    mtype = {"neohooke": "neohooke", "svk": "stvenantkirchhoff"}[model]
    mat = make_material({"type": mtype, "youngs": 100.0, "nue": 0.3,
                         "density": 1.0})
    from fourc_tpu.materials.elastic import lame

    lam_, mu_ = (float(x) for x in lame(100.0, 0.3))
    rng = np.random.RandomState(0)
    u = jnp.asarray(0.05 * rng.randn(disc.n_nodes * 3))

    force = lp.make_force_wide_general(spec, disc.coords, lam_, mu_, model,
                                       interpret=True)
    uw = lp.prep(u, spec)
    fw = np.asarray(lp.unprep(force(uw), spec))
    fref = _reference_force(disc, u, mat)
    np.testing.assert_allclose(fw, fref, rtol=2e-4, atol=2e-5)


def test_general_wide_jvp_matches_fd():
    disc = _jittered_box(3)
    spec = lat.LatticeSpec(pshape=(4, 4, 4), h=(1 / 3,) * 3)
    from fourc_tpu.materials.elastic import lame

    lam_, mu_ = (float(x) for x in lame(100.0, 0.3))
    rng = np.random.RandomState(1)
    u = jnp.asarray(0.03 * rng.randn(disc.n_nodes * 3))
    v = jnp.asarray(rng.randn(disc.n_nodes * 3))

    force = lp.make_force_wide_general(spec, disc.coords, lam_, mu_,
                                       "neohooke", interpret=True)
    uw, vw = lp.prep(u, spec), lp.prep(v, spec)
    dy = np.asarray(lp.unprep(
        jax.jvp(force, (uw,), (vw,))[1], spec))
    # reference tangent: jvp through the f64 einsum element force
    mat = make_material({"type": "neohooke", "youngs": 100.0, "nue": 0.3,
                         "density": 1.0})
    # f64 finite difference of the reference force (exact to ~1e-9)
    eps = 1e-6
    fd = (_reference_force(disc, u + eps * v, mat)
          - _reference_force(disc, u - eps * v, mat)) / (2 * eps)
    np.testing.assert_allclose(dy, fd, rtol=2e-4, atol=2e-4)


def test_general_wide_mass_matches_reference():
    disc = _jittered_box(3)
    spec = lat.LatticeSpec(pshape=(4, 4, 4), h=(1 / 3,) * 3)
    rho = 2.5
    rng = np.random.RandomState(2)
    v = jnp.asarray(rng.randn(disc.n_nodes * 3))
    mass = lp.make_mass_wide_general(spec, disc.coords, rho, interpret=True)
    mv = np.asarray(lp.unprep(mass(lp.prep(v, spec)), spec))

    # reference: consistent mass element matrices, numpy assembly
    cell = cells.get_cell("hex8")
    conn = np.asarray(next(iter(disc.blocks.values())).conn)
    Xe = np.asarray(disc.coords)[conn]
    dN = np.asarray(cell.dN)
    N = np.asarray(cell.N)
    w = np.asarray(cell.gauss_weights)
    out = np.zeros((disc.n_nodes, 3))
    v3 = np.asarray(v).reshape(-1, 3)
    for e in range(conn.shape[0]):
        for g in range(8):
            J = Xe[e].T @ dN[g]
            wdet = np.linalg.det(J) * w[g]
            vbar = N[g] @ v3[conn[e]]
            out[conn[e]] += rho * wdet * np.outer(N[g], vbar)
    np.testing.assert_allclose(mv, out.reshape(-1), rtol=1e-4, atol=1e-6)
