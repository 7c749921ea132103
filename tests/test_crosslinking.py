"""Crosslinking submodel: stochastic linker binding + network mechanics.

ref: src/beaminteraction/src/4C_beaminteraction_submodel_evaluator_
crosslinking.cpp (diffusing crosslinkers bind filament spots, doubly-bound
linkers act as springs).

Oracles:
- kinetics: with k_off = 0 and spots in reach, every linker double-binds;
  the on/off equilibrium bound fraction tracks k_on/(k_on + k_off)
- mechanics: two parallel filaments bridged by crosslinkers at separation
  > rest length are pulled TOGETHER during overdamped relaxation
- determinism: the PRNG key lives in the state, so a rerun reproduces the
  trajectory exactly
"""

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.core.conditions import DirichletBC
from fourc_tpu.core.mesh import Discretization
from fourc_tpu.coupling import crosslinking as xl
from fourc_tpu.materials import make_material
from fourc_tpu.physics import browniandyn as bd
from fourc_tpu.physics import solid as ps


def test_kinetics_all_bind_with_fast_on():
    params = xl.CrosslinkParams(n_linkers=16, k_on=1e3, k_off=0.0,
                                r_reach=0.5, seed=2)
    spots = jnp.asarray(np.random.default_rng(0).uniform(0, 0.3, (10, 3)))
    lstate = xl.init_linkers(params, [0, 0, 0], [0.3, 0.3, 0.3])
    key = jax.random.PRNGKey(0)
    for i in range(6):
        key, k = jax.random.split(key)
        lstate = xl.kinetics_step(k, lstate, spots, 0.1, params)
    bond = np.asarray(lstate["bond"])
    assert (bond >= 0).all(), bond  # every linker doubly bound
    # the two slots bind DIFFERENT spots
    assert (bond[:, 0] != bond[:, 1]).all()


def test_kinetics_equilibrium_fraction():
    """Single-slot occupancy tracks k_on/(k_on+k_off) within statistics."""
    kon, koff = 20.0, 20.0
    params = xl.CrosslinkParams(n_linkers=400, k_on=kon, k_off=koff,
                                r_reach=10.0, seed=5)
    spots = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (12, 3)))
    lstate = xl.init_linkers(params, [0, 0, 0], [1, 1, 1])
    key = jax.random.PRNGKey(3)
    fracs = []
    for i in range(120):
        key, k = jax.random.split(key)
        lstate = xl.kinetics_step(k, lstate, spots, 0.01, params)
        if i > 60:  # after burn-in
            fracs.append(float((np.asarray(lstate["bond"]) >= 0).mean()))
    # both slots follow the same on/off process -> mean occupancy 0.5
    assert abs(np.mean(fracs) - 0.5) < 0.08, np.mean(fracs)


def _two_filaments(sep):
    """Two parallel 3-node truss filaments along x at y = 0 and y = sep."""
    coords = [[i * 0.5, 0.0, 0.0] for i in range(3)] + [
        [i * 0.5, sep, 0.0] for i in range(3)]
    d = Discretization(name="structure", coords=np.asarray(coords, float))
    d.add_block("line2", np.asarray([[0, 1], [1, 2], [3, 4], [4, 5]],
                                    np.int32), mat_id=1)
    return d


def test_network_contraction():
    """Crosslinkers with rest length < filament separation pull the two
    filaments together under overdamped (kT=0) relaxation."""
    sep = 0.3
    disc = _two_filaments(sep)
    mat = make_material({"type": "truss", "youngs": 500.0, "area": 0.01})
    # pin filament ends in x and z; leave y free so they can approach
    dbc = [DirichletBC(np.array([0, 2, 3, 5]), [1, 0, 1, 1, 1, 1], [0] * 6),
           DirichletBC(np.array([1, 4]), [0, 0, 1, 1, 1, 1], [0] * 6)]
    p = ps.SolidParams(dyntype="statics")
    p.newton.tol_res = 1e-10
    p.newton.tol_disp = 1e-12
    p.newton.max_iter = 30

    from fourc_tpu.physics import beam as pb

    f = pb.BeamField(disc, {1: mat}, p, dirichlet=dbc)
    bp = bd.BrownianParams(kt=0.0, damping_coeff=2.0, seed=0)
    clp = xl.CrosslinkParams(n_linkers=12, k_on=1e3, k_off=0.0,
                             k_spring=50.0, l0=0.1, r_reach=0.4, seed=7)
    final, traj = bd.run(f, bp, dt=0.05, numstep=40, crosslink=clp)
    d = np.asarray(final["d"]).reshape(-1, 6)
    bond = np.asarray(final["linkers"]["bond"])
    assert ((bond >= 0).sum(axis=1) == 2).any()  # network formed
    # filament 0 moved up, filament 1 moved down (y gap shrinks)
    gap = (sep + d[3:, 1].mean()) - d[:3, 1].mean()
    assert gap < sep - 0.05, gap
    # springs cannot over-contract below rest length
    assert gap > clp.l0 - 0.05


def test_trajectory_reproducible():
    disc = _two_filaments(0.3)
    mat = make_material({"type": "truss", "youngs": 500.0, "area": 0.01})
    dbc = [DirichletBC(np.array([0, 3]), [1, 0, 1, 1, 1, 1], [0] * 6)]
    p = ps.SolidParams(dyntype="statics")
    p.newton.tol_res = 1e-10

    from fourc_tpu.physics import beam as pb

    f = pb.BeamField(disc, {1: mat}, p, dirichlet=dbc)
    bp = bd.BrownianParams(kt=1e-4, damping_coeff=2.0, seed=11)
    clp = xl.CrosslinkParams(n_linkers=8, k_on=50.0, k_off=10.0,
                             k_spring=20.0, l0=0.1, r_reach=0.4, seed=3)
    f1, _ = bd.run(f, bp, dt=0.02, numstep=15, crosslink=clp)
    f2, _ = bd.run(f, bp, dt=0.02, numstep=15, crosslink=clp)
    np.testing.assert_array_equal(np.asarray(f1["d"]), np.asarray(f2["d"]))
    np.testing.assert_array_equal(np.asarray(f1["linkers"]["bond"]),
                                  np.asarray(f2["linkers"]["bond"]))
