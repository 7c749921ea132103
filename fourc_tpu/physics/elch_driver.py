"""Electrochemistry (elch) driver: multi-species Nernst-Planck + potential.

Counterpart of the reference's elch module (ref: src/elch —
`ElCh::Algorithm` Nernst-Planck drivers on top of scatra; species are
MAT_ion materials inside MAT_elchmat, 4C_mat_elchmat.* / 4C_mat_ion.*;
element kernels src/scatra_ele/4C_scatra_ele_calc_elch_NP.*).

TPU-native design: ONE field with K+1 dofs per node (c_1..c_K, phi) on the
shared dofmap machinery; the whole coupled Newton (migration coupling +
electroneutrality closure) is a single matrix-free Newton-Krylov on device.
The reference assembles an (K+1)x(K+1) block element matrix with hand-coded
migration linearizations; here the tangent is jvp through the residual.

Time integration: one-step-theta on the concentrations; the potential is
algebraic (ENC) — an index-1 DAE handled naturally by the implicit solve.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.materials.base import register_material
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics.newton import newton_solve
from fourc_tpu.utils.timer import Timers


@register_material("elchmat")
@dataclass
class ElchMat:
    """Electrolyte material: K ionic species (ref: MAT_elchmat holding
    MAT_ion species with valence + diffusivity)."""

    kind = "elch"
    species: list  # [{valence, diffusivity, c0}, ...]
    temperature: float = 298.0
    faraday: float = 96485.3329
    gas_constant: float = 8.314462

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    @property
    def frt(self):
        return self.faraday / (self.gas_constant * self.temperature)

    @property
    def valences(self):
        return [float(s["valence"]) for s in self.species]

    @property
    def diffs(self):
        return [float(s["diffusivity"]) for s in self.species]

    @property
    def c0(self):
        return [float(s.get("c0", 0.0)) for s in self.species]


class ElchField:
    """K+1 dofs/node: (c_1..c_K, phi)."""

    def __init__(self, disc, materials, params, dirichlet=(), neumann=(),
                 functions=None):
        from fourc_tpu.core.conditions import DirichletHandler
        from fourc_tpu.core.functions import FunctionManager

        self.disc = disc
        self.params = params
        self.functions = functions or FunctionManager()
        mats = {mid: m for mid, m in materials.items()
                if getattr(m, "kind", "") in ("elch", "elch_diffcond")}
        self.mat = next(iter(mats.values()))
        # formulation: Nernst-Planck + ENC (elchmat) vs diffusion-conduction
        # (Newman binary electrolyte; ref Inpar::ElCh::diffcond)
        self.diffcond = getattr(self.mat, "kind", "") == "elch_diffcond"
        self.K = 1 if self.diffcond else len(self.mat.species)
        self.ndpn = self.K + 1
        self.dofmap = disc.dofmap(self.ndpn)
        self.ndof = self.dofmap.ndof
        dirichlet = list(dirichlet)
        if "__padding__" in disc.node_sets and len(disc.node_sets["__padding__"]):
            from fourc_tpu.core.conditions import DirichletBC

            dirichlet.append(DirichletBC(disc.node_sets["__padding__"],
                                         [1] * self.ndpn, [0.0] * self.ndpn))
        self.dbc = DirichletHandler(dirichlet, disc.coords, self.ndpn,
                                    self.functions)
        self.coords = jnp.asarray(disc.coords)
        self.block_X = {key: self.coords[self.dofmap.blocks[key].conn]
                        for key in self.dofmap.blocks}
        # ENC row scaling for conditioning (dimensionless O(1) wrt species eq)
        self.enc_scale = 1.0
        # preconditioner constants, computed EAGERLY here: the
        # c-dependent material laws are jnp expressions, and
        # build_preconditioner runs under the jitted step trace where
        # float() of a staged constant fails
        if self.diffcond:
            c0 = jnp.asarray(float(self.mat.c0))
            self._pc_props = (
                np.asarray([float(self.mat.diff_c(c0))]),
                float(self.mat.kappa_c(c0)) / self.mat.faraday,
            )
        else:
            self._pc_props = (np.asarray(self.mat.diffs), None)
        # electrode-kinetics (S2I Butler-Volmer) boundary data
        self.electrodes = []  # [(spec dict, face cell, conn, Xf)]

    def add_electrode(self, spec, face_blocks):
        """Butler-Volmer electrode boundary (ref: the reference's
        ElchElectrodeKinetics condition, scatra_ele elch electrode-kinetics
        boundary terms 4C_scatra_ele_boundary_calc_elch_electrode.*):

          i = i0 [exp(alpha_a F eta / RT) - exp(-alpha_c F eta / RT)],
          eta = V_metal - phi - e0;  species flux n.N_s = i / (z_s F).

        spec: {species (1-based id), i0, alpha_a, alpha_c, e0, v_funct}.
        """
        from fourc_tpu.core.cells import get_cell

        for fb in face_blocks:
            fc = get_cell(fb.cell)
            conn = jnp.asarray(np.asarray(fb.conn))
            self.electrodes.append((dict(spec), fc, conn, self.coords[conn]))

    def _electrode_flux(self, y, t):
        """Boundary residual contributions from electrode kinetics."""
        from fourc_tpu.ops import common as gm

        r = jnp.zeros((self.ndof,), y.dtype)
        if not self.electrodes:
            return r
        yn = y.reshape(-1, self.ndpn)
        F = self.mat.faraday
        frt = self.mat.frt
        for spec, fc, conn, Xf in self.electrodes:
            k = int(spec.get("species", 1)) - 1
            z = (self.mat.valence if self.diffcond
                 else self.mat.valences[k])
            i0 = float(spec["i0"])
            aa = float(spec.get("alpha_a", 0.5))
            ac = float(spec.get("alpha_c", 0.5))
            e0 = float(spec.get("e0", 0.0))
            vfn = self.functions.get(int(spec.get("v_funct", 0) or 0)) \
                if spec.get("v_funct") else None
            N = jnp.asarray(fc.N, y.dtype)
            dA, _ = gm.surface_measure(Xf, fc.dN)
            w = jnp.asarray(fc.gauss_weights, y.dtype)
            phig = jnp.einsum("ga,ea->eg", N, yn[:, self.K][conn])
            xg = gm.interp_field(Xf, fc.N)
            V = vfn(xg, t, component=0) if vfn is not None else 0.0
            eta = V - phig - e0
            i = i0 * (jnp.exp(aa * frt * eta) - jnp.exp(-ac * frt * eta))
            # species mass flux INTO the electrolyte: i/(zF); residual is
            # r = f_int - f_bnd
            fe = jnp.einsum("g,eg,ga,eg->ea", w, dA, N, i / (z * F))
            dof = conn * self.ndpn + k
            r = r.at[dof.reshape(-1)].add(-fe.reshape(-1))
            if self.diffcond:
                # current continuity: the interfacial current density also
                # loads the potential row (ref: diffcond electrode-kinetics
                # boundary terms feed both c and phi equations)
                fphi = jnp.einsum("g,eg,ga,eg->ea", w, dA, N, i / F)
                dphi = conn * self.ndpn + self.K
                r = r.at[dphi.reshape(-1)].add(-fphi.reshape(-1))
        return r

    def _cell(self, key):
        from fourc_tpu.core.cells import get_cell

        return get_cell(self.dofmap.blocks[key].cell)

    def split(self, y):
        """(ndof,) -> c (n_nodes, K), phi (n_nodes,)"""
        yn = y.reshape(-1, self.ndpn)
        return yn[:, : self.K], yn[:, self.K]

    def residual(self, y, ydot, t):
        """Stacked NP + ENC residual; ydot only meaningful on c-dofs."""
        from fourc_tpu.ops import elch as eops

        dm = self.dofmap
        per_block = {}
        for key in dm.blocks:
            cell = self._cell(key)
            ye = dm.gather(y, key)  # (e, nen, K+1)
            ydote = dm.gather(ydot, key)
            ce, phie = ye[..., : self.K], ye[..., self.K]
            cdote = ydote[..., : self.K]
            if self.diffcond:
                f_c1, f_phi = eops.residual_diffcond(
                    self.block_X[key], ce[..., 0], cdote[..., 0], phie,
                    cell, self.mat)
                f_c = f_c1[..., None]
            else:
                f_c, f_phi = eops.residual_np(
                    self.block_X[key], ce, cdote, phie, cell,
                    self.mat.valences, self.mat.diffs, self.mat.frt,
                    enc_scale=self.enc_scale,
                )
            per_block[key] = jnp.concatenate([f_c, f_phi[..., None]], axis=-1) \
                .reshape(f_c.shape[0], -1)
        return dm.scatter_add(per_block) + self._electrode_flux(y, t)

    def build_preconditioner(self, dt_factor):
        """Jacobi on species diagonals (diffusion + capacity); identity on
        the potential rows (the ENC row has a zero phi-diagonal)."""
        from fourc_tpu.linalg.precond import jacobi
        from fourc_tpu.ops import common as gm

        dm = self.dofmap
        per_block = {}
        D, kap0 = self._pc_props  # eager (build_preconditioner is traced)
        for key in dm.blocks:
            cell = self._cell(key)
            G, detJ = gm.iso_gradients(self.block_X[key], cell.dN)
            wdet = gm.weighted(detJ, cell.gauss_weights)
            N = jnp.asarray(cell.N, wdet.dtype)
            kdiag = jnp.einsum("eg,egad,egad->ea", wdet, G, G)  # (e, nen)
            mdiag = jnp.einsum("eg,ga,ga->ea", wdet, N, N)
            dk = kdiag[..., None] * jnp.asarray(D, wdet.dtype) \
                + dt_factor * mdiag[..., None]  # (e, nen, K)
            if kap0 is not None:
                # diffcond potential row: ohmic diagonal kappa/F
                dphi = kap0 * kdiag[..., None]
            else:
                dphi = jnp.ones_like(kdiag)[..., None]
            per_block[key] = jnp.concatenate([dk, dphi], axis=-1) \
                .reshape(kdiag.shape[0], -1)
        diag = dm.scatter_add(per_block)
        diag = jnp.where(self.dbc.free_mask, jnp.maximum(diag, 1e-30), 1.0)
        return jacobi(diag)


def build_field(deck) -> ElchField:
    from fourc_tpu.materials import make_material
    from fourc_tpu.physics import scalar_transport as st

    disc = next(iter(deck.disc.values()))
    dyn = deck.sections["scatra_dynamic"]
    solver = deck.sections["solver"]
    params = st.ScalarParams(
        dyntype=dyn["dynamictype"], dt=dyn["timestep"], n_steps=dyn["numstep"],
        theta=dyn["theta"], newton=drv.newton_params_from(dyn, solver, deck.sections.get("io")),
        divercont=dyn["divercont"], dtype=deck.problem["dtype"],
    )
    if params.newton.lin_method == "cg":  # NP+ENC system is nonsymmetric
        params.newton.lin_method = "gmres"
    materials = {mid: make_material(spec) for mid, spec in deck.materials.items()}
    fieldname = next(iter(deck.disc))
    conds = deck.conditions.get(fieldname, {}) or deck.conditions.get("elch", {})
    f = ElchField(disc, materials, params,
                  dirichlet=conds.get("dirichlet", ()),
                  neumann=conds.get("neumann", ()),
                  functions=deck.functions)
    for ek in conds.get("electrode_kinetics", ()):
        f.add_electrode(ek["spec"], ek["faces"])
    return f


def init_state(f: ElchField):
    want64 = f.params.dtype == "float64" and jax.config.jax_enable_x64
    dtype = jnp.float64 if want64 else jnp.float32
    y0 = np.zeros((f.disc.n_nodes, f.ndpn), dtype)
    y0[:, : f.K] = np.asarray(f.mat.c0, dtype)
    y = f.dbc.apply(jnp.asarray(y0.reshape(-1)), 0.0)
    return {"y": y, "ydot": jnp.zeros_like(y),
            "t": jnp.asarray(0.0, dtype), "step": jnp.asarray(0)}


def make_step(f: ElchField, dt: float):
    theta = f.params.theta

    def step(state):
        t1 = state["t"] + dt
        y_n, ydot_n = state["y"], state["ydot"]
        # c-dof selector: rate applies to concentrations only
        sel = np.zeros((f.ndpn,), bool)
        sel[: f.K] = True
        cmask = jnp.asarray(np.tile(sel, f.disc.n_nodes))

        def residual(y1):
            ydot1 = jnp.where(
                cmask,
                (y1 - y_n) / (theta * dt) - (1 - theta) / theta * ydot_n,
                0.0,
            )
            return f.residual(y1, ydot1, t1)

        y0 = f.dbc.apply(y_n, t1)
        M = f.build_preconditioner(dt_factor=1.0 / (theta * dt))
        y, stats = newton_solve(residual, y0, f.dbc.free_mask, M,
                                f.params.newton)
        ydot1 = jnp.where(cmask, (y - y_n) / (theta * dt)
                          - (1 - theta) / theta * ydot_n, 0.0)
        new = dict(state)
        new.update(y=y, ydot=f.dbc.mask(ydot1), t=t1, step=state["step"] + 1)
        return new, stats

    return jax.jit(step)


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    with timers("setup"):
        f = build_field(deck)
        state = init_state(f)
    dyn = deck.sections["scatra_dynamic"]
    n_steps = dyn["numstep"]
    cbs = list(callbacks or [])
    state, n_steps, cbs = drv.setup_restart(deck, "elch", state, n_steps, cbs)
    state, agg = drv.time_loop(
        "elch", state, lambda dt: make_step(f, dt), dyn["timestep"],
        n_steps, divercont=dyn["divercont"], callbacks=cbs, timers=timers,
    )
    return drv.RunResult(
        deck=deck, fields={"elch": ElchFieldView(f)},
        states={"elch": state}, stats={"elch": agg}, timers=timers,
    )


class ElchFieldView:
    def __init__(self, f: ElchField):
        self.f = f

    def node_value(self, state, quantity: str, node: int):
        y = np.asarray(state["y"]).reshape(-1, self.f.ndpn)
        q = quantity.lower()
        if q in ("phi", "pot", "potential"):
            return float(y[node, self.f.K])
        if q.startswith("c"):
            k = int(q[1:] or 1) - 1
            return float(y[node, k])
        raise KeyError(quantity)
