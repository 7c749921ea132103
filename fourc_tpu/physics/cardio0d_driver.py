"""0D lumped-parameter circulation (Windkessel) coupled to a 3D structure.

Counterpart of the reference's cardiovascular0d module
(ref: src/cardiovascular0d — `Utils::Cardiovascular0DManager` coupling 0D
circulation ODEs to structure cavities via surface conditions, own
monolithic solver 4C_cardiovascular0d_structure_new_model_evaluator.*).

Model (2-element Windkessel per coupled cavity):

    C dp/dt + p / R = Q_in(t) - dV/dt,     V(d) = (1/3) oint x . n dA

over a CLOSED structure surface; p acts back on that surface as a follower
pressure.  TPU-native: the coupled unknown y = [d; p] is solved by ONE
matrix-free Newton-Krylov — jvp supplies dV/dd and the follower-load
pressure tangent the reference hand-assembles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.ops import common as gm
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics import structure_driver
from fourc_tpu.physics.newton import newton_solve
from fourc_tpu.utils.timer import Timers


class Cardio0DField:
    """Structure + one Windkessel compartment attached to a closed surface."""

    def __init__(self, solid: ps.SolidField, cfg, functions):
        from fourc_tpu.core.cells import get_cell

        self.solid = solid
        self.R = float(cfg["resistance"])
        self.C = float(cfg["compliance"])
        self.p0 = float(cfg["p0"])
        self.q_fn = functions.get(int(cfg["q_in_funct"])) \
            if cfg["q_in_funct"] else None
        # coupling surface: face blocks (closed surface for exact volume);
        # comma-separated set names are concatenated (e.g. all box faces)
        self.faces = []
        surf = cfg["surface"]
        if isinstance(surf, str):
            fbs = []
            for name in surf.split(","):
                fbs.extend(solid.disc.face_sets[name.strip()])
        else:
            fbs = surf
        # orient every face OUTWARD (away from the body centroid) in the
        # reference configuration — mesh face sets are not guaranteed to be
        # consistently oriented
        X0 = np.asarray(solid.disc.coords)
        centroid = X0.mean(axis=0)
        for fb in fbs:
            fc = get_cell(fb.cell)
            conn = np.asarray(fb.conn)
            Xf = jnp.asarray(X0[conn])
            dA, n = gm.surface_measure(Xf, fc.dN)
            fcent = X0[conn].mean(axis=1)  # (F, 3)
            nmean = np.asarray(jnp.mean(n, axis=1))  # (F, 3)
            sign = np.where(
                np.einsum("fd,fd->f", nmean, fcent - centroid) >= 0, 1.0, -1.0)
            self.faces.append((fc, jnp.asarray(conn),
                               jnp.asarray(sign)))
        self.nd = solid.ndof

    def volume(self, d):
        """Enclosed volume via the divergence theorem: (1/3) oint x.n dA,
        exact for a closed surface with outward normals."""
        x = self.solid.coords + d.reshape(-1, self.solid.ndpn)
        V = 0.0
        for fc, conn, sign in self.faces:
            Xf = x[conn]  # (F, nenf, 3)
            dA, n = gm.surface_measure(Xf, fc.dN)  # (F,g), (F,g,3)
            w = jnp.asarray(fc.gauss_weights, Xf.dtype)
            N = jnp.asarray(fc.N, Xf.dtype)
            xg = jnp.einsum("ga,fad->fgd", N, Xf)
            V = V + jnp.einsum("f,g,fg,fgd,fgd->", sign, w, dA, xg, n) / 3.0
        return V

    def pressure_force(self, d, p):
        """Follower pressure p on the coupling surface -> nodal forces."""
        from fourc_tpu.ops import solid as sops

        x = self.solid.coords + d.reshape(-1, self.solid.ndpn)
        f = jnp.zeros_like(x)
        for fc, conn, sign in self.faces:
            Xf = self.solid.coords[conn]
            uf = x[conn] - Xf
            # cavity convention: p > 0 pushes the surface OUTWARD (+p n);
            # surface_pressure_force uses the external-pressure sign (-p n)
            pg = -p * sign[:, None] * jnp.ones((1, fc.ngp), x.dtype)
            fe = sops.surface_pressure_force(Xf, uf, pg, fc, follower=True)
            f = f.at[conn.reshape(-1)].add(fe.reshape(-1, x.shape[1]))
        return f.reshape(-1)

    def split(self, y):
        return y[: self.nd], y[self.nd]

    @property
    def free_mask(self):
        return jnp.concatenate([self.solid.dbc.free_mask,
                                jnp.ones((1,), bool)])


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    with timers("setup"):
        solid = structure_driver.build_field(deck, next(iter(deck.disc)))
        cfg = deck.sections["cardiovascular0d"]
        f = Cardio0DField(solid, cfg, deck.functions)
        state = ps.init_state(solid)
        state["p0d"] = jnp.asarray(f.p0, state["d"].dtype)
        state["V"] = f.volume(state["d"])
    dt = cfg["timestep"]
    n_steps = cfg["numstep"]
    sp = solid.params
    theta = sp.theta if sp.dyntype == "onesteptheta" else 1.0
    # 0D-equation scale: bring the Windkessel row to the force-residual scale
    w0d = float(cfg["scale_0d"])

    def make_step(dt):
        @jax.jit
        def step(state):
            t1 = state["t"] + dt
            d_n, p_n, V_n = state["d"], state["p0d"], state["V"]

            def residual(y):
                d, p = f.split(y)
                fint, _ = solid.internal_force(d, history=state["hist"] or None,
                                               dt=dt)
                fext = solid.external_force(t1, d)
                r_u = fint - fext - f.pressure_force(d, p)
                V = f.volume(d)
                q_in = f.q_fn(jnp.zeros((1, 3), d.dtype), t1, component=0)[0] \
                    if f.q_fn else 0.0
                r_p = (f.C * (p - p_n) / dt + p / f.R
                       - q_in + (V - V_n) / dt)
                return jnp.concatenate([r_u, w0d * r_p[None]])

            d0 = solid.dbc.apply(d_n, t1)
            y0 = jnp.concatenate([d0, p_n[None]])
            Ms = solid.build_preconditioner(d0, dt=dt)

            def M(r):
                return jnp.concatenate([Ms(r[: f.nd]), r[f.nd:]])

            nw = sp.newton
            if nw.lin_method == "cg":  # follower load -> nonsymmetric
                from dataclasses import replace

                nw = replace(nw, lin_method="gmres")
            y, stats = newton_solve(residual, y0, f.free_mask, M, nw)
            d, p = f.split(y)
            new = dict(state)
            fint_new, hist_new = solid.internal_force(
                d, history=state["hist"] or None, dt=dt)
            new.update(d=d, p0d=p, V=f.volume(d), t=t1,
                       step=state["step"] + 1, fint=fint_new,
                       fext=solid.external_force(t1, d),
                       hist=hist_new or state["hist"])
            return new, stats

        return step

    cbs = list(callbacks or [])
    state, _nsteps, cbs = drv.setup_restart(deck, "cardio0d", state, n_steps, cbs)
    state, agg = drv.time_loop(
        "cardio0d", state, make_step, dt, _nsteps,
        divercont=sp.divercont, callbacks=cbs, timers=timers,
    )
    view = structure_driver.SolidFieldView(solid)
    return drv.RunResult(
        deck=deck,
        fields={"cardio0d": Cardio0DView(f, view), "structure": view},
        states={"cardio0d": state,
                "structure": {"d": state["d"], "v": state["v"],
                              "a": state["a"], "hist": state["hist"]}},
        stats={"cardio0d": agg, "structure": agg},
        timers=timers,
    )


class Cardio0DView:
    def __init__(self, f, solid_view):
        self.f = f
        self._solid = solid_view

    def node_value(self, state, quantity, node):
        q = quantity.lower()
        if q in ("p0d", "pressure0d"):
            return float(state["p0d"])
        if q in ("volume", "v0d"):
            return float(state["V"])
        return self._solid.node_value(state, quantity, node)
