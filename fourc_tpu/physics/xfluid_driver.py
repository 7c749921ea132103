"""fluid_xfem problem driver: deck -> embedded (CutFEM) Stokes solve.

Counterpart of the reference's XFEM fluid problem type
(ref: ProblemType::fluid_xfem in
4C_legacy_enum_definitions_problem_type.hpp; src/fluid_xfluid
FLD::XFluid built on the Cut library; src/xfem condition manager).

Deck semantics: the background mesh (quad4 rectangle or hex8 box) is cut
by the level set FUNCT given in ``xfluid_dynamic.levelset_funct``
(fluid occupies phi < 0); Dirichlet conditions impose strong velocity
values on background-mesh nodes (VAL*FUNCT per component); the embedded
interface carries a weak (symmetric Nitsche) velocity condition from
``interface_funct`` (0 = no-slip).  The solve is the verification-grade
host CutFEM Stokes path (cut/xfluid.py 2D, cut/xfluid3d.py 3D).
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.physics import driver as drv
from fourc_tpu.utils.timer import Timers


def _component_fn(fm, fid, comp, scale, t):
    """(x, y[, z]) -> scale * FUNCT_fid[comp](x, y, z, t) as a host float."""
    if not fid:
        return lambda *xyz: scale
    f = fm.get(fid)
    expr = f.components[min(comp, len(f.components) - 1)]

    def fn(x, y, z=0.0):
        return scale * float(np.asarray(expr(x, y, z, t)))

    return fn


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    dyn = deck.sections["xfluid_dynamic"]
    name = next(iter(deck.disc))
    disc = deck.disc[name]
    dim = disc.dim
    X = np.asarray(disc.coords)
    fm = deck.functions
    t = float(dyn["time"])

    # level set: fluid where phi < 0
    phi_fn = fm.get(int(dyn["levelset_funct"]))
    phi = np.asarray(phi_fn(X, t, component=0))

    # interface velocity (weak Nitsche datum)
    gid = int(dyn["interface_funct"])
    if gid:
        gf = fm.get(gid)

        def g_interface(*xyz):
            p = np.zeros((1, 3))
            p[0, :len(xyz)] = xyz
            vals = np.asarray(gf(p, t))  # (1, ncomp)
            out = np.zeros(dim)
            out[:min(dim, vals.shape[1])] = vals[0, :dim]
            return out
    else:
        zero = np.zeros(dim)

        def g_interface(*xyz):
            return zero

    # strong Dirichlet velocity rows from deck conditions
    conds = deck.conditions.get(name, {})
    strong = []
    for c in conds.get("dirichlet", ()):
        for k in range(min(dim, len(c.onoff))):
            if c.onoff[k]:
                strong.append((c.nodes, k,
                               _component_fn(fm, c.funct[k], k, c.val[k], t)))

    mat = next(iter(deck.materials.values()))
    mu = float(mat.get("viscosity", 1.0))
    body = tuple(dyn["body"] or ([0.0] * dim))

    with timers("step"):
        key, blk = next(iter(disc.blocks.items()))
        conn = np.asarray(blk.conn)
        if dim == 2:
            from fourc_tpu.cut.xfluid import solve_stokes_cut as solve
        else:
            from fourc_tpu.cut.xfluid3d import solve_stokes_cut3d as solve
        vel, p, cm = solve(X, conn, phi, g_interface,
                           strong_dirichlet=strong, mu=mu, body=body,
                           nitsche=float(dyn["nitsche"]),
                           pspg_alpha=float(dyn["pspg_alpha"]))

    state = {"vel": vel, "p": p, "t": t, "step": 1}
    agg = {"steps": 1, "active_nodes": int(np.sum(cm.active_nodes))}
    if callbacks:
        for cb in callbacks:
            cb("xfluid", state, agg)
    return drv.RunResult(
        deck=deck, fields={"xfluid": XFluidView(cm, dim)},
        states={"xfluid": state}, stats={"xfluid": agg}, timers=timers,
    )


class XFluidView:
    def __init__(self, cm, dim):
        self.cm = cm
        self.dim = dim

    def node_value(self, state, quantity, node):
        q = quantity.lower()
        if q.startswith("vel"):
            return float(state["vel"][node, "xyz".index(q[3])])
        if q in ("pressure", "pres", "p"):
            return float(state["p"][node])
        raise KeyError(quantity)
