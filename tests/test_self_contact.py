"""Self-contact: one surface contacting itself (adjacency-excluded search).

ref: the reference's self-contact machinery (src/contact —
4C_contact_selfcontact_binarytree.* search; self-contact decks): slave
nodes and master faces come from the same surface, and the search must
skip each node's own neighborhood.

Setup: a single C-shaped block (box with a slit cut into its free end).
A ramped surface load folds the upper jaw down onto the lower one — the
slit's two surfaces belong to ONE connected surface of ONE body, so only
self-contact can carry the closing force.

Oracles:
- the adjacency exclusion holds (no candidate face touches its slave
  node's 1-ring)
- without contact the load folds the jaw deep through the slit; with
  self-contact the jaws end in light touch (penetration eliminated up to
  penalty compliance)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC
from fourc_tpu.core.mesh import Discretization, ElementBlock, FaceBlock
from fourc_tpu.coupling.embedded_mesh import _boundary_quads
from fourc_tpu.materials import make_material
from fourc_tpu.physics import solid as ps
from fourc_tpu.contact.penalty import ContactCondition, PenaltyContact

pytestmark = pytest.mark.minimal


def _c_mesh():
    d = gridgen.box(6, 1, 6, lo=(0, 0, 0), hi=(1.0, 0.2, 1.0))
    conn = np.asarray(d.blocks["hex8"].conn)
    X = np.asarray(d.coords)
    cent = X[conn].mean(axis=1)
    slit = (cent[:, 0] > 1 / 3) & (cent[:, 2] > 1 / 3) & (cent[:, 2] < 2 / 3)
    keep = conn[~slit]
    used = np.unique(keep)
    remap = -np.ones(X.shape[0], np.int64)
    remap[used] = np.arange(used.size)
    coords = X[used]
    conn2 = remap[keep].astype(np.int32)
    disc = Discretization(name="structure", coords=coords)
    disc.blocks["hex8"] = ElementBlock("hex8", conn2, 1)
    quads = _boundary_quads([conn2])
    qc = coords[quads].mean(axis=1)
    in_slit = (qc[:, 0] > 1 / 3) & (qc[:, 2] > 0.3) & (qc[:, 2] < 0.7)
    slit_quads = quads[in_slit]
    disc.node_sets["all"] = np.arange(coords.shape[0], dtype=np.int32)
    return disc, coords, slit_quads


def _solve(with_contact, pressure=-25.0):
    from fourc_tpu.core.conditions import NeumannBC

    disc, coords, slit_quads = _c_mesh()
    spine = np.where(coords[:, 0] < 1e-9)[0]
    base = np.where(coords[:, 2] < 1e-9)[0]  # lower jaw held
    # surface load folds the upper jaw down onto the lower one
    quads = _boundary_quads([np.asarray(disc.blocks["hex8"].conn)])
    qc = coords[quads].mean(axis=1)
    top = quads[(qc[:, 2] > 1.0 - 1e-9) & (qc[:, 0] > 1 / 3)]
    slit_nodes = np.unique(slit_quads)
    mat = make_material({"type": "stvenantkirchhoff", "youngs": 1000.0,
                        "nue": 0.0})
    params = ps.SolidParams(kinem="nonlinear", dyntype="statics",
                            precond="block_jacobi")
    params.newton.max_iter = 60
    params.newton.tol_res = 1e-6
    params.newton.tol_disp = 1e-8
    params.newton.line_search = True
    # GMRES: the projection/blending terms make the active-contact
    # tangent nonsymmetric (CG diverges on it)
    params.newton.lin_method = "gmres"
    params.newton.gmres_restart = 100
    params.newton.lin_maxiter = 2000
    from fourc_tpu.core.functions import FunctionManager

    fm = FunctionManager()
    fm.add(1, "t")
    dbc = [DirichletBC(spine, [1, 1, 1], [0, 0, 0]),
           DirichletBC(base, [1, 1, 1], [0, 0, 0])]
    neu = [NeumannBC([FaceBlock("quad4", top)], [0, 0, 1],
                     [0, 0, pressure], funct=[0, 0, 1])]
    contact = ()
    if with_contact:
        contact = [ContactCondition(
            slave_nodes=slit_nodes.astype(np.int32),
            master_faces=[FaceBlock("quad4", slit_quads)],
            slave_faces=[FaceBlock("quad4", slit_quads)],
            penalty=2e4, n_candidates=4, self_exclude=True)]
    f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu,
                      contact=contact, functions=fm)
    state = ps.compute_initial_state(f, ps.init_state(f))
    step = ps.make_step(f, dt=0.1)  # 10 load increments
    for _ in range(10):
        state, stats = step(state)
    d = np.asarray(state["d"]).reshape(-1, 3)
    return f, coords, slit_quads, d, stats


def _slit_gap(coords, slit_quads, d):
    """Min vertical clearance between deformed upper and lower slit
    surfaces over the overlapping x-range."""
    x = coords + d
    qc0 = coords[slit_quads].mean(axis=1)
    upper = np.unique(slit_quads[qc0[:, 2] > 0.5])
    lower = np.unique(slit_quads[qc0[:, 2] < 0.5])
    xu, xl = x[upper], x[lower]
    gaps = []
    for p in xu:
        near = np.linalg.norm(xl[:, [0, 1]] - p[[0, 1]], axis=1) < 0.12
        if near.any():
            gaps.append(p[2] - xl[near, 2].max())
    return min(gaps)


def test_adjacency_exclusion():
    disc, coords, slit_quads = _c_mesh()
    slit_nodes = np.unique(slit_quads).astype(np.int32)
    pc = PenaltyContact([ContactCondition(
        slave_nodes=slit_nodes, master_faces=[FaceBlock("quad4", slit_quads)],
        penalty=1e4, n_candidates=4, self_exclude=True)], coords, 3)
    pair = pc.pairs[0]
    mconn = np.asarray(pair["mconn"])
    cand = np.asarray(pair["cand"])
    ring = {}
    for face in mconn:
        for nd in face:
            ring.setdefault(int(nd), set()).update(int(x) for x in face)
    for si, s in enumerate(np.asarray(pair["slave"])):
        for fj in cand[si]:
            assert not (set(int(x) for x in mconn[fj]) & ring[int(s)]), \
                (s, fj)


def test_self_contact_prevents_interpenetration():
    f0, coords, slit_quads, d_free, st0 = _solve(with_contact=False)
    gap_free = _slit_gap(coords, slit_quads, d_free)
    assert gap_free < -0.1, gap_free  # free folding interpenetrates deeply

    f1, coords, slit_quads, d_con, st1 = _solve(with_contact=True)
    assert bool(st1["converged"]), st1
    gap_con = _slit_gap(coords, slit_quads, d_con)
    # self-contact carries the load: penetration eliminated up to the
    # penalty compliance; the jaws end in light touch
    assert gap_con > -0.02, gap_con
    assert gap_con < 0.08, gap_con
