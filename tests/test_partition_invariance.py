"""Partition invariance: the same problem solved unsharded and sharded over
an 8-device mesh gives the same trajectory.

The reference tests this by running every deck at NP 1..4 with identical
RESULT DESCRIPTION values (ref: tests/list_of_tests.cmake); here the virtual
CPU mesh from conftest plays the role of the ranks.
"""

import numpy as np
import jax
import jax.numpy as jnp

from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC, NeumannBC
from fourc_tpu.materials import make_material
from fourc_tpu.parallel import partition, sharding
from fourc_tpu.physics import solid as ps


def _run(disc, n_steps=2):
    mat = make_material({"type": "neohooke", "youngs": 1e4, "nue": 0.3, "density": 1.0})
    params = ps.SolidParams(kinem="nonlinear", dyntype="genalpha",
                            genalpha=ps.GenAlphaParams(rho_inf=0.9),
                            precond="block_jacobi")
    params.newton.tol_res = 1e-9
    params.newton.tol_disp = 1e-10
    params.newton.lin_rtol = 1e-10
    params.newton.lin_adaptive = False
    params.newton.lin_maxiter = 3000
    dbc = [DirichletBC(disc.node_sets["zmin"], [1, 1, 1], [0, 0, 0])]
    neu = [NeumannBC(disc.face_sets["zmax"], [1, 0, 0], [100.0, 0, 0])]
    f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu)
    return f


def test_sharded_matches_unsharded():
    disc0 = gridgen.box(6, 4, 4, cell="hex8")
    f0 = _run(disc0)
    st0 = ps.compute_initial_state(f0, ps.init_state(f0))
    step0 = ps.make_step(f0, dt=0.02)
    for _ in range(2):
        st0, _ = step0(st0)
    d_ref = np.asarray(st0["d"]).reshape(-1, 3)

    disc1, old2new = partition.reorder_for_devices(gridgen.box(6, 4, 4), 8)
    disc1 = partition.pad_for_devices(disc1, 8)
    f1 = _run(disc1)
    mesh = sharding.make_mesh(8)
    sharding.shard_solid_field(f1, mesh)
    st1 = sharding.shard_state(ps.init_state(f1), mesh)
    st1 = ps.compute_initial_state(f1, st1)
    step1 = ps.make_step(f1, dt=0.02)
    for _ in range(2):
        st1, _ = step1(st1)
    d_sh = np.asarray(st1["d"]).reshape(-1, 3)

    # map back: original node i lives at new id old2new[i]
    d_mapped = d_sh[old2new]
    err = np.abs(d_mapped - d_ref).max()
    scale = np.abs(d_ref).max()
    assert err < 1e-8 * max(scale, 1.0), f"partition changed the solution by {err}"
