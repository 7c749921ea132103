"""Structural mechanics field: time integration + nonlinear solve.

Counterpart of the reference's structure_new module
(ref: src/structure_new/src/4C_structure_new_timint_base.hpp — TimeInt
Implicit/Explicit; implicit integrators Statics / OneStepTheta / GenAlpha in
src/structure_new/src/impl/; explicit central difference in explicit/;
`perform_error_action` divergence handling in
4C_structure_new_timint_implicit.cpp:230-350).

A SolidField owns the discretization + materials + BCs and provides pure
residual/force functions; integrators are builders returning ONE jitted
``step(state) -> (state, stats)`` containing the full Newton-Krylov loop.
The host time loop (physics/driver.py) only dispatches steps, checks the
returned convergence flag (DIVERCONT) and triggers output.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.core.conditions import DirichletHandler
from fourc_tpu.core.functions import FunctionManager
from fourc_tpu.core.mesh import Discretization
from fourc_tpu.linalg import precond as pc
from fourc_tpu.ops import common as gm
from fourc_tpu.ops import solid as ops
from fourc_tpu.physics.newton import NewtonParams, newton_solve


@dataclass
class GenAlphaParams:
    """ref: Inpar GENALPHA sub-group (4C_inpar_structure.cpp); defaults from
    rho_inf like the reference's RHO_INF-based parametrisation."""

    rho_inf: float = 1.0

    @property
    def alpha_m(self):
        return (2.0 * self.rho_inf - 1.0) / (self.rho_inf + 1.0)

    @property
    def alpha_f(self):
        return self.rho_inf / (self.rho_inf + 1.0)

    @property
    def beta(self):
        return 0.25 * (1.0 - self.alpha_m + self.alpha_f) ** 2

    @property
    def gamma(self):
        return 0.5 - self.alpha_m + self.alpha_f


@dataclass
class SolidParams:
    kinem: str = "nonlinear"  # ref: KINEM flag on SOLID elements
    tech: str = "none"  # ref: TECH flag — none|fbar (EAS planned)
    dyntype: str = "statics"  # ref: DYNAMICTYPE (statics/onesteptheta/genalpha/explicit)
    dt: float = 1.0
    n_steps: int = 1
    theta: float = 0.5  # one-step-theta
    genalpha: GenAlphaParams = field(default_factory=GenAlphaParams)
    newton: NewtonParams = field(default_factory=NewtonParams)
    precond: str = "block_jacobi"  # none|jacobi|block_jacobi|chebyshev|gmg
    mass: str = "consistent"  # consistent|lumped  (ref LUMPMASS)
    rayleigh_alpha: float = 0.0  # ref M_DAMP
    rayleigh_beta: float = 0.0  # ref K_DAMP
    divercont: str = "stop"  # ref DIVERCONT: stop|halve_step|adapt_step
    max_halvings: int = 5
    predictor: str = "constdis"  # ref PREDICT: constdis|constvel|constvelacc|tangdis
    dtype: str = "float64"
    # host-orchestrated Newton: the residual and each linear solve compile
    # as SEPARATE programs and the Newton loop runs on the host.  Same
    # algorithm; ~3x smaller compile units (needed for very large meshes on
    # the remote-compile TPU path, where one monolithic step HLO overwhelms
    # the compile service).  Costs one host sync per Newton iteration.
    host_newton: bool = False
    # wide-layout lattice stepping (physics/solid_lattice.py): keeps the
    # whole Newton-Krylov loop in the (3, X, Y, Z) kernel layout — no
    # flat<->lattice relayouts in the hot path (the measured dominant cost
    # at 1M dofs).  State dicts become wide; use solid_lattice.flatten_state
    # before io.  Opt-in: the flagship bench path.
    wide: bool = False


class SolidField:
    """Discretization + materials + BCs -> pure force functions.

    materials: {mat_id(int): Material}; each element block must be
    homogeneous in material (deck reader splits blocks by mat id).
    """

    def __init__(
        self,
        disc: Discretization,
        materials: dict,
        params: SolidParams,
        dirichlet=(),
        neumann=(),
        point_neumann=(),
        body_forces=(),
        contact=(),
        mortar_contact=(),
        meshtying=(),
        springs=(),
        constraints=(),
        embedded_mesh=(),
        functions: FunctionManager | None = None,
        extra_force_hook: bool = False,
    ):
        self.disc = disc
        self.params = params
        self.functions = functions or FunctionManager()
        self.ndpn = disc.dim
        self.dofmap = disc.dofmap(self.ndpn)
        self.ndof = self.dofmap.ndof
        dirichlet = list(dirichlet)
        if "__padding__" in disc.node_sets and len(disc.node_sets["__padding__"]):
            from fourc_tpu.core.conditions import DirichletBC

            dirichlet.append(
                DirichletBC(disc.node_sets["__padding__"],
                            [1] * self.ndpn, [0.0] * self.ndpn)
            )
        # embedded-mesh overlay coupling (constraint_framework analog; see
        # coupling/embedded_mesh.py): interface penalty tie + background
        # volume-fraction scales that void the overlapped material
        self.embedded = []
        self.elem_scale = {}
        for em in embedded_mesh:
            from fourc_tpu.coupling.embedded_mesh import EmbeddedMeshTie

            tie = EmbeddedMeshTie(disc, em["nodes"],
                                  penalty=float(em.get("penalty", 1e5)),
                                  ndpn=self.ndpn)
            self.embedded.append(tie)
            for key, s in tie.block_scale.items():
                prev = self.elem_scale.get(key)
                self.elem_scale[key] = s if prev is None else prev * s
        self.elem_scale = {k: jnp.asarray(v) for k, v in self.elem_scale.items()
                           if np.any(np.asarray(v) < 1.0)}
        self.embedded_dead_nodes = np.zeros(0, np.int64)
        if self.elem_scale:
            # background nodes whose entire element support is voided have
            # zero stiffness rows — deactivate them (the reference's
            # small/empty volume-cell dof deactivation in the cut)
            support = np.zeros(disc.n_nodes)
            for key, blk in disc.blocks.items():
                conn = np.asarray(blk.conn)
                s = np.asarray(self.elem_scale.get(key,
                                                   np.ones(conn.shape[0])))
                np.add.at(support, conn.reshape(-1),
                          np.repeat(s, conn.shape[1]))
            self.embedded_dead_nodes = np.where(support < 1e-12)[0]
            if len(self.embedded_dead_nodes):
                from fourc_tpu.core.conditions import DirichletBC

                dirichlet.append(
                    DirichletBC(self.embedded_dead_nodes,
                                [1] * self.ndpn, [0.0] * self.ndpn))

        self.dbc = DirichletHandler(dirichlet, disc.coords, self.ndpn, self.functions)
        self.neumann = list(neumann)
        self.point_neumann = list(point_neumann)
        self.body_forces = list(body_forces)

        self.coords = jnp.asarray(disc.coords)
        self.block_mat = {}
        self.block_X = {}
        for key, blk in disc.blocks.items():
            mid = int(np.asarray(blk.mat_id)[0])
            if not np.all(np.asarray(blk.mat_id) == mid):
                raise ValueError(
                    f"block {key} mixes materials; split blocks by material id"
                )
            self.block_mat[key] = materials[mid]
            self.block_X[key] = self.coords[self.dofmap.blocks[key].conn]

        # Neumann faces: pre-gather face coords + per-face metadata
        self._neumann_data = []
        for nb in self.neumann:
            for fb in nb.faces:
                from fourc_tpu.core.cells import get_cell

                fc = get_cell(fb.cell)
                conn = jnp.asarray(fb.conn)
                Xf = self.coords[conn]
                self._neumann_data.append((nb, fc, conn, Xf))

        self._density = {
            key: float(getattr(m, "density", 0.0) or 0.0) for key, m in self.block_mat.items()
        }

        # global constraints (volume / MPC; physics/constraints.py)
        self.constraints = list(constraints)

        # spring-dashpot supports (ref: structure_new model evaluator
        # SpringDashpot, 4C_structure_new_model_evaluator_springdashpot.*):
        # Robin-type boundary f = k u + c v, dashpot via backward-difference
        # velocity (u - u_old)/dt
        self.springs = []
        for sp in springs:
            nodes = jnp.asarray(np.asarray(sp["nodes"], np.int32))
            k = np.zeros(self.ndpn)
            c = np.zeros(self.ndpn)
            for i, v in enumerate(list(sp.get("stiffness") or [])[: self.ndpn]):
                k[i] = float(v)
            for i, v in enumerate(list(sp.get("viscosity") or [])[: self.ndpn]):
                c[i] = float(v)
            self.springs.append((nodes, jnp.asarray(k), jnp.asarray(c)))

        self.contact = None
        if contact:
            from fourc_tpu.contact.penalty import PenaltyContact

            self.contact = PenaltyContact(list(contact), disc.coords, self.ndpn)

        # mortar-Lagrange contact (contact/mortar.py): handled by a
        # dedicated semismooth step builder, not the residual tail
        self.mortar_contact = []
        if mortar_contact:
            from fourc_tpu.contact import mortar as _mc

            self.mortar_contact = _mc.attach(self, list(mortar_contact))

        # lattice fast path: on a single-block uniform hex8 lattice the
        # whole force/tangent/mass hot loop collapses to fused 3D stencil
        # kernels (ops/lattice.py; Pallas on TPU) — no gather/scatter at
        # all.  Springs/contact/meshtying still add their terms on top.
        self.lattice = None
        self._lattice_force = None
        self._lattice_mass = None
        if (len(self.block_mat) == 1 and self.ndpn == 3
                and params.kinem == "nonlinear" and params.tech == "none"):
            mat0 = next(iter(self.block_mat.values()))
            if not getattr(mat0, "history_shape", ()):
                from fourc_tpu.ops import lattice as _lat

                spec = _lat.detect_lattice(disc) if _lat.enabled() else None
                if spec is not None:
                    fn = _lat.make_force_flat(
                        spec, self._cell(next(iter(self.block_mat))), mat0)
                    if fn is not None:
                        self.lattice = spec
                        self._lattice_force = fn
                        if params.mass == "consistent":
                            # eagerly, while block_X is concrete (the
                            # hoister swaps it for tracers inside jit)
                            self._mass_stencil()

        # general-geometry lattice (round 4): box TOPOLOGY with arbitrary
        # node positions (jittered/graded/externally-read) — the wide
        # relayout-free Newton path with per-element jacobians computed
        # in-kernel (ops/lattice_pallas general kernels)
        self.lattice_geom = None
        if (self.lattice is None and len(self.block_mat) == 1
                and self.ndpn == 3 and params.kinem == "nonlinear"
                and params.tech == "none"):
            from fourc_tpu.ops import lattice as _lat

            mat0 = next(iter(self.block_mat.values()))
            ba = next(iter(self.dofmap.blocks.values()))
            if (_lat.enabled() and ba.cell == "hex8"
                    and ba.structured is not None
                    and len(ba.structured["shape"]) == 3
                    and not getattr(mat0, "history_shape", ())
                    and _lat._material_model(mat0) is not None):
                self.lattice_geom = _lat.LatticeSpec(
                    pshape=tuple(ba.structured["pshape"]),
                    h=(1.0, 1.0, 1.0))

        # argument hoisting: register every big device buffer so jitted
        # steps take them as runtime parameters instead of HLO literals
        # (see utils/hoist.py — 2 GB lowered modules otherwise at 1M dofs)
        from fourc_tpu.utils.hoist import Hoister

        self.hoister = Hoister()
        self.hoister.register_attr(self, "coords")
        # mortar-contact segment buffers: hoisted so the per-step host
        # re-segmentation (contact/mortar.py refresh) needs no recompile
        for mc in self.mortar_contact:
            for nm in ("seg_sf", "seg_xi", "seg_mf", "seg_w"):
                self.hoister.register_attr(mc, nm)
        # optional external nodal-force slot (PASI particle reactions):
        # hoisted so the driver can refresh it every step without recompile
        self.pasi_force = None
        if extra_force_hook:
            self.pasi_force = jnp.zeros((self.ndof,), self.coords.dtype)
            self.hoister.register_attr(self, "pasi_force")
        # Lagrange-enforced global constraints: hoist the multiplier
        # buffers so the driver's Uzawa updates need no recompile
        for con in self.constraints:
            if getattr(con, "enforcement", "penalty") == "lagrange":
                self.hoister.register_attr(con, "lam_buf")
        for key in self.block_X:
            self.hoister.register_item(self.block_X, key)
        # hoist the f32 mask WEIGHT, not the bool mask: a packed-pred
        # lattice-sized runtime input faults the TPU worker at ~1M dofs
        # (round-1 finding, re-confirmed round 2 — NOTES_ROUND2.md); any
        # residual bool use lowers as a compile-time literal instead
        self.hoister.register_attr(self.dbc, "_free_w")
        for key, ba in self.dofmap.blocks.items():
            if ba.structured is None:
                self.hoister.register_attr(ba, "conn")
                self.hoister.register_attr(ba, "perm")
                self.hoister.register_attr(ba, "sorted_dof")
                if ba.inc is not None:
                    self.hoister.register_attr(ba, "inc")

        self.ties = None
        if meshtying:
            meshtying = list(meshtying)
            mortars = [mt for mt in meshtying if mt.get("mortar")]
            conforming = [mt for mt in meshtying if not mt.get("mortar")]
            if mortars and conforming:
                raise NotImplementedError("mix of mortar and conforming ties")
            if mortars:
                from fourc_tpu.coupling.mortar import (MortarTies,
                                                       mortar_interpolation)

                sn, mids, ws = [], [], []
                for mt in mortars:
                    a, b, c = mortar_interpolation(
                        disc.coords, mt["slave_faces"], mt["master_faces"])
                    sn.append(a); mids.append(b); ws.append(c)
                K = max(m.shape[1] for m in mids)
                mids = [np.pad(m, ((0, 0), (0, K - m.shape[1]))) for m in mids]
                ws = [np.pad(w, ((0, 0), (0, K - w.shape[1]))) for w in ws]
                self.ties = MortarTies(np.concatenate(sn),
                                       np.concatenate(mids),
                                       np.concatenate(ws),
                                       self.ndpn, disc.n_nodes)
            else:
                from fourc_tpu.coupling.meshtying import TiedDofs, match_pairs

                pairs = np.concatenate(
                    [match_pairs(disc.coords, mt["slave_nodes"],
                                 mt["master_nodes"],
                                 offset=mt.get("offset"))
                     for mt in meshtying], axis=0,
                )
                self.ties = TiedDofs(pairs, self.ndpn, disc.n_nodes)
            # tied slave dofs behave like constrained dofs for the solver
            self.dbc.free_mask = jnp.logical_and(
                self.dbc.free_mask, jnp.logical_not(self.ties.slave_mask)
            )

    def _residual_xform(self, residual_fn):
        """Apply mesh-tying condensation to a residual function (no-op
        without ties)."""
        if self.ties is None:
            return residual_fn, lambda u: u
        return self.ties.wrap_residual(residual_fn), self.ties.spread

    # -- forces -------------------------------------------------------------

    def internal_force(self, u, history=None, dt=None, temps=None,
                       cstate=None, u_old=None):
        """Global internal force f_int(u); returns (vector, new_history).

        cstate/u_old: contact-state pytree + last converged displacement
        (multiplier + friction-history strategies; see contact/penalty.py).
        """
        dm = self.dofmap
        per_block, new_hist = {}, {}
        if (self._lattice_force is not None and not history and temps is None):
            f = self._lattice_force(u)
            return self._tail_forces(f, u, u_old, dt, cstate, history), None
        for key in dm.blocks:
            ue = dm.gather(u, key)
            h = None if history is None else history.get(key)
            tg = None if temps is None else temps.get(key)
            if self._is_membrane(key):
                from fourc_tpu.ops import membrane as mops

                m = self.block_mat[key]
                fe = mops.internal_force(self.block_X[key], ue,
                                         self._cell(key), m, m.thickness)
                hn = None
                per_block[key] = fe.reshape(fe.shape[0], -1)
                continue
            fe, hn = ops.internal_force(
                self.block_X[key], ue, self._cell(key),
                self.block_mat[key], kinem=self.params.kinem, history=h, dt=dt,
                temps=tg, tech=self.params.tech,
            )
            per_block[key] = fe.reshape(fe.shape[0], -1)
            if hn is not None:
                new_hist[key] = hn
        for key, s in self.elem_scale.items():
            if key in per_block:
                per_block[key] = per_block[key] * s[:, None].astype(u.dtype)
        f = dm.scatter_add(per_block)
        f = self._tail_forces(f, u, u_old, dt, cstate, history)
        return f, (new_hist if new_hist else None)

    def _tail_forces(self, f, u, u_old, dt, cstate, history):
        """Spring-dashpot + contact additions to the bulk internal force."""
        for tie in getattr(self, "embedded", ()):
            f = f + tie.force(u)
        if self.springs:
            un = u.reshape(-1, self.ndpn)
            uo = None if u_old is None else u_old.reshape(-1, self.ndpn)
            for nodes, k, c in self.springs:
                fsp = k[None, :] * un[nodes]
                if uo is not None and dt:
                    fsp = fsp + c[None, :] * (un[nodes] - uo[nodes]) / dt
                f = f.reshape(-1, self.ndpn).at[nodes].add(fsp).reshape(-1)
        if self.contact is not None:
            # contact enters the residual like an internal force: at
            # equilibrium fint = fext + F_contact (ref: contact forces in the
            # structural model evaluator, 4C_contact_penalty_strategy.*)
            x = self.coords + u.reshape(-1, self.ndpn)
            xo = None if u_old is None else self.coords + u_old.reshape(-1, self.ndpn)
            sig = (self.nodal_stresses(u, history=history, dt=dt)
                   if self.contact.needs_stress else None)
            f = f - self.contact.force(x, cstate, xo, sig=sig).reshape(-1)
        return f

    def _cell(self, key):
        from fourc_tpu.core.cells import get_cell

        return get_cell(self.dofmap.blocks[key].cell)

    def _is_membrane(self, key):
        """2D cells carrying a membrane material in a 3D field (ref:
        src/membrane elements)."""
        return (getattr(self.block_mat[key], "kind", "") == "membrane"
                and self.ndpn == 3)

    def external_force(self, t, u=None):
        """Global external force at time t (Neumann + point + body loads,
        minus global-constraint penalty forces)."""
        f = jnp.zeros((self.ndof,), dtype=self.coords.dtype)
        if self.constraints:
            uc = f if u is None else u
            for con in self.constraints:
                f = f - con.force(uc, t)
        d = self.ndpn
        for nb, fc, conn, Xf in self._neumann_data:
            if nb.kind == "pressure":
                uf = (
                    u.reshape(-1, d)[conn]
                    if u is not None
                    else jnp.zeros_like(Xf)
                )
                fn = self.functions.get(nb.funct[0])
                xg = gm.interp_field(Xf, fc.N)
                p = nb.val[0] * fn(xg, t, component=0)
                fe = ops.surface_pressure_force(Xf, uf, p, fc, follower=True)
            else:
                comps = []
                xg = gm.interp_field(Xf, fc.N)  # (n_face, ngp, d)
                for k in range(d):
                    if k < len(nb.onoff) and nb.onoff[k]:
                        fn = self.functions.get(nb.funct[k])
                        comps.append(nb.val[k] * fn(xg, t, component=0))
                    else:
                        comps.append(jnp.zeros(xg.shape[:2]))
                trac = jnp.stack(comps, axis=-1)
                fe = ops.surface_traction_force(Xf, trac, fc)
            edof = conn[:, :, None] * d + jnp.arange(d)[None, None, :]
            f = f.at[edof.reshape(-1)].add(fe.reshape(-1))

        for pb in self.point_neumann:
            xyz = self.coords[jnp.asarray(pb.nodes)]
            for k in range(min(d, len(pb.onoff))):
                if pb.onoff[k]:
                    fn = self.functions.get(pb.funct[k])
                    vals = pb.val[k] * fn(xyz, t, component=0)
                    dofs = jnp.asarray(pb.nodes) * d + k
                    f = f.at[dofs].add(vals)

        for bf in self.body_forces:
            f = f + self._body_force(bf, t)
        if self.pasi_force is not None:
            # externally supplied nodal forces (PASI particle-wall reactions
            # etc.) — hoisted, so updating f.pasi_force between steps needs
            # no recompile
            f = f + self.pasi_force
        return f

    def _body_force(self, bf, t):
        dm = self.dofmap
        per_block = {}
        for key in dm.blocks:
            cell = self._cell(key)
            Xe = self.block_X[key]
            rho = self._density[key] or 1.0
            _, detJ = gm.iso_gradients(Xe, cell.dN)
            wdet = gm.weighted(detJ, cell.gauss_weights)
            xg = gm.interp_field(Xe, cell.N)
            comps = []
            for k in range(self.ndpn):
                if k < len(bf.val) and bf.val[k] != 0:
                    fn = self.functions.get(bf.funct[k])
                    comps.append(bf.val[k] * fn(xg, t, component=0))
                else:
                    comps.append(jnp.zeros(xg.shape[:2]))
            b = jnp.stack(comps, axis=-1)  # (e,g,d)
            fe = rho * jnp.einsum("eg,ga,egd->ead", wdet, jnp.asarray(cell.N), b)
            per_block[key] = fe.reshape(fe.shape[0], -1)
        return dm.scatter_add(per_block)

    # -- mass ---------------------------------------------------------------

    def lumped_mass(self):
        dm = self.dofmap
        per_block = {}
        for key in dm.blocks:
            if self._is_membrane(key):
                from fourc_tpu.ops import membrane as mops

                mat = self.block_mat[key]
                m = mops.lumped_mass(self.block_X[key], self._cell(key),
                                     self._density[key] * mat.thickness)
            else:
                m = ops.lumped_mass(self.block_X[key], self._cell(key), self._density[key])
            if key in self.elem_scale:
                m = m * self.elem_scale[key][:, None].astype(m.dtype)
            per_block[key] = jnp.repeat(m, self.ndpn, axis=-1).reshape(m.shape[0], -1)
        return dm.scatter_add(per_block)

    def _mass_stencil(self):
        """Congruent-element consistent-mass (8,3,8,3) stencil (lattice)."""
        if self._lattice_mass is None:
            from fourc_tpu.ops import lattice as _lat

            key = next(iter(self.block_mat))
            cell = self._cell(key)
            Xe1 = self.block_X[key][:1]
            cols = []
            for k in range(24):
                ve = jnp.zeros((1, 24)).at[:, k].set(1.0).reshape(1, 8, 3)
                cols.append(ops.consistent_mass_matvec(
                    Xe1, ve, cell, self._density[key]).reshape(24))
            Me = np.stack([np.asarray(c) for c in cols], axis=1)
            self._lattice_mass = _lat.collapse_stencil(Me)
        return self._lattice_mass

    def mass_matvec(self, v):
        if self.params.mass == "lumped":
            if not hasattr(self, "_mlump"):
                self._mlump = self.lumped_mass()
            return self._mlump * v
        if self.lattice is not None:
            from fourc_tpu.ops import lattice as _lat

            return _lat.stencil_matvec_flat(self._mass_stencil(), v,
                                            self.lattice)
        dm = self.dofmap
        per_block = {}
        for key in dm.blocks:
            ve = dm.gather(v, key)
            me = ops.consistent_mass_matvec(
                self.block_X[key], ve, self._cell(key), self._density[key]
            )
            if key in self.elem_scale:
                me = me * self.elem_scale[key][:, None, None].astype(me.dtype)
            per_block[key] = me.reshape(me.shape[0], -1)
        return dm.scatter_add(per_block)

    # -- preconditioner -----------------------------------------------------

    def _build_amg(self, mass_shift=0.0):
        """Smoothed-aggregation AMG on the assembled LINEAR-elastic
        rediscretization (state-independent, reusable across Newton/time
        steps — the same reuse strategy as the structured GMG; ref: MueLu
        preconditioner reuse)."""
        key_ = (round(float(mass_shift), 10),)
        cache = getattr(self, "_amg_cache", {})
        # optional DISK cache (FOURC_AMG_CACHE=dir): the host hierarchy
        # build is deterministic in (mesh, materials, mass_shift) and
        # costs ~45 min at 555k dofs on a 1-core host — bench reruns load
        # it in seconds (the MueLu-reuse analog, persisted)
        import os as _os

        cdir = _os.environ.get("FOURC_AMG_CACHE", "")
        cpath = None
        if cdir and key_ not in cache:
            import hashlib

            from fourc_tpu.linalg import amg as _amgmod

            h = hashlib.sha1()
            for k2 in sorted(self.dofmap.blocks):
                h.update(np.asarray(self.dofmap.blocks[k2].conn).tobytes())
                m2 = self.block_mat[k2]
                h.update(f"{m2.youngs}:{m2.nue}:{self._density[k2]}".encode())
            h.update(np.asarray(self.disc.coords).astype(np.float32).tobytes())
            h.update(f"{key_[0]}:{_os.environ.get('FOURC_AMG_CHEBY', '3')}"
                     .encode())
            _os.makedirs(cdir, exist_ok=True)
            cpath = _os.path.join(cdir, f"amg_{h.hexdigest()[:16]}.npz")
            if _os.path.exists(cpath):
                cache[key_] = _amgmod.load_amg(cpath)
                self._amg_cache = cache
        if key_ not in cache:
            import scipy.sparse as sp

            from fourc_tpu.linalg.amg import SmoothedAggregationAMG
            from fourc_tpu.materials.small_strain import LinearElastic

            # HOST-side assembly: element stiffnesses computed on device
            # (batched, fast), everything else in scipy — the previous
            # device-pattern path spent minutes in remote eager dispatches
            # and shipped multi-100MB index arrays through the tunnel for
            # a matrix that scipy consumes on the host anyway
            ndof = self.ndof
            rows, cols, vals = [], [], []
            for key in self.dofmap.blocks:
                m = self.block_mat[key]
                lin = LinearElastic(youngs=float(m.youngs),
                                    nue=float(m.nue))
                cell = self._cell(key)
                ue0 = jnp.zeros_like(self.block_X[key])
                Ke = ops.element_stiffness(self.block_X[key], ue0, cell, lin,
                                           kinem="linear")
                if mass_shift:
                    ml = ops.lumped_mass(self.block_X[key], cell,
                                         self._density[key])
                    nend = Ke.shape[1]
                    mdiag = jnp.repeat(ml, self.ndpn, axis=1).reshape(
                        Ke.shape[0], nend)
                    Ke = Ke + mass_shift * jax.vmap(jnp.diag)(mdiag)
                Ke_np = np.asarray(Ke, np.float64)
                edof = np.asarray(self.dofmap.blocks[key].edof)
                nd = edof.shape[1]
                rows.append(np.repeat(edof, nd, axis=1).reshape(-1))
                cols.append(np.tile(edof, (1, nd)).reshape(-1))
                vals.append(Ke_np.reshape(-1))
            A0 = sp.coo_matrix(
                (np.concatenate(vals),
                 (np.concatenate(rows), np.concatenate(cols))),
                shape=(ndof, ndof)).tocsr()  # duplicates summed
            free = np.asarray(self.dbc.free_mask)
            D = sp.diags(free.astype(np.float64))
            A0 = (D @ A0 @ D + sp.diags((~free).astype(np.float64))).tocsr()
            import os as _os

            M = SmoothedAggregationAMG(
                A0, self.ndpn, self.dbc.free_mask,
                cheby_degree=int(_os.environ.get("FOURC_AMG_CHEBY", "3")))
            if hasattr(self, "hoister"):
                # ELL tables are hundreds of MB at 1M dofs — pass them as
                # runtime inputs, never HLO literals (see utils/hoist.py)
                for lev in M.levels:
                    self.hoister.register_item(lev, "dinv")
                    for nm in ("A", "P", "R"):
                        if lev.get(nm) is not None:
                            self.hoister.register_attr(lev[nm], "blk")
                            self.hoister.register_attr(lev[nm], "nbr")
                self.hoister.register_attr(M, "_coarse_inv")
            cache[key_] = M
            self._amg_cache = cache
            if cpath is not None:
                from fourc_tpu.linalg import amg as _amgmod

                _amgmod.save_amg(M, cpath)
        return cache[key_]

    def build_preconditioner(self, u, history=None, dt=None, mass_shift=0.0):
        """Block-Jacobi (k x k nodal blocks) from the element tangents at u.

        mass_shift: adds c * M contributions for dynamic effective systems.
        """
        kind = self.params.precond
        if kind == "none":
            return lambda r: r
        if kind == "amg":
            return self._build_amg(mass_shift)
        d = self.ndpn
        nn = self.disc.n_nodes
        blocks = jnp.zeros((nn, d, d), dtype=self.coords.dtype)
        dm = self.dofmap
        for key in dm.blocks:
            cell = self._cell(key)
            ue = dm.gather(u, key)
            h = None if history is None else history.get(key)
            if self._is_membrane(key):
                from fourc_tpu.ops import membrane as mops

                mat = self.block_mat[key]
                Ke = mops.element_stiffness(self.block_X[key], ue, cell, mat,
                                            mat.thickness)
            else:
                Ke = ops.element_stiffness(
                    self.block_X[key], ue, cell, self.block_mat[key],
                    kinem=self.params.kinem, history=h, dt=dt,
                )  # (e, nen*d, nen*d)
            nen = cell.nen
            Ke = Ke.reshape(-1, nen, d, nen, d)
            diag_blocks = jnp.einsum("eaiaj->eaij", Ke)  # (e, nen, d, d)
            if mass_shift:
                if self._is_membrane(key):
                    from fourc_tpu.ops import membrane as mops

                    m = mops.lumped_mass(self.block_X[key], cell,
                                         self._density[key]
                                         * self.block_mat[key].thickness)
                else:
                    m = ops.lumped_mass(self.block_X[key], cell, self._density[key])
                eye = jnp.eye(d, dtype=m.dtype)
                diag_blocks = diag_blocks + mass_shift * m[..., None, None] * eye
            conn = dm.blocks[key].conn
            blocks = blocks.at[conn.reshape(-1)].add(diag_blocks.reshape(-1, d, d))

        # constrained dofs: identity rows/cols so the preconditioner is
        # mask-safe (free/fixed coupling removed)
        free = self.dbc.free_mask.reshape(nn, d)
        eye = jnp.eye(d, dtype=blocks.dtype)
        fm = free[..., None] & free[..., None, :]
        blocks = jnp.where(fm, blocks, 0.0) + jnp.where(
            jnp.logical_not(free)[..., None] & (eye[None] > 0), 1.0, 0.0
        )
        if kind == "jacobi":
            diag = jnp.einsum("nii->ni", blocks).reshape(-1)
            return pc.jacobi(diag)
        return pc.block_jacobi(blocks)

    # -- output quantities ----------------------------------------------------

    def nodal_stresses(self, u, history=None, dt=None):
        """Volume-weighted nodal average of GP Cauchy stresses: (n_nodes, 3, 3)."""
        dm = self.dofmap
        nn = self.disc.n_nodes
        num = jnp.zeros((nn, 3, 3))
        den = jnp.zeros((nn,))
        for key in dm.blocks:
            cell = self._cell(key)
            ue = dm.gather(u, key)
            h = None if history is None else history.get(key)
            sig = ops.gp_stresses(
                self.block_X[key], ue, cell, self.block_mat[key],
                kinem=self.params.kinem, history=h, dt=dt,
                tech=getattr(self.params, "tech", "none"),
            )
            nod = ops.extrapolate_to_nodes(sig, cell)  # (e, nen, 3, 3)
            conn = dm.blocks[key].conn.reshape(-1)
            num = num.at[conn].add(nod.reshape(-1, 3, 3))
            den = den.at[conn].add(jnp.ones_like(conn, dtype=den.dtype))
        return num / jnp.maximum(den, 1.0)[:, None, None]

    def strain_energy(self, u):
        total = 0.0
        for key in self.dofmap.blocks:
            total = total + ops.strain_energy(
                self.block_X[key], self.dofmap.gather(u, key), self._cell(key),
                self.block_mat[key], kinem=self.params.kinem,
            )
        return total


# ---------------------------------------------------------------------------
# state + integrators
# ---------------------------------------------------------------------------


def update_prestress(f: SolidField, state):
    """MULF prestress update after a converged prestress step
    (ref: solid prestress MULF — F0 <- F F0 per GP, displacements reset).
    Returns the reset state with the updated prestretch history."""
    from fourc_tpu.ops import common as gm

    d = state["d"]
    hist = dict(state["hist"])
    eye = jnp.eye(3)
    for key in f.dofmap.blocks:
        m = f.block_mat[key]
        if getattr(m, "history_shape", ()) != (9,):
            continue
        cell = f._cell(key)
        ue = f.dofmap.gather(d, key)  # (e, nen, 3)
        G, _ = gm.iso_gradients(f.block_X[key], cell.dN)  # (e,g,a,3)
        H = jnp.einsum("egad,eai->egid", G, ue)
        F = H + eye[None, None]
        e, g = F.shape[:2]
        F0 = hist[key].reshape(e, g, 3, 3)
        hist[key] = jnp.einsum("egik,egkj->egij", F, F0).reshape(e, g, 9)
    z = jnp.zeros_like(d)
    new = dict(state)
    new.update(d=z, v=z, a=z, fint=z, hist=hist)
    return new


def init_state(f: SolidField):
    import jax as _jax

    want64 = f.params.dtype == "float64" and _jax.config.jax_enable_x64
    z = jnp.zeros((f.ndof,), dtype=jnp.float64 if want64 else jnp.float32)
    hist = {}
    for key, blk in f.dofmap.blocks.items():
        m = f.block_mat[key]
        if getattr(m, "history_shape", ()):
            cell = f._cell(key)
            n = blk.conn.shape[0] * cell.ngp
            hist[key] = m.init_history(n).reshape(blk.conn.shape[0], cell.ngp, -1)
    state = {
        "d": z,
        "v": z,
        "a": z,
        "t": jnp.asarray(0.0, z.dtype),
        "step": jnp.asarray(0),
        "fint": z,
        "fext": z,
        "hist": hist,
    }
    if f.contact is not None and f.contact.stateful:
        state["con"] = f.contact.init_state(z.dtype)
    if getattr(f, "mortar_contact", None):
        from fourc_tpu.contact.mortar import lam_size

        state["lam"] = jnp.zeros(
            (sum(lam_size(c) for c in f.mortar_contact),), z.dtype)
    return state


def compute_initial_state(f: SolidField, state, consistent_mass_tol=1e-10):
    """Make forces + acceleration consistent with the current (d, v, t).

    Analog of the reference's initial-acceleration solve
    (M a0 = f_ext(0) - f_int(d0), ref: structure time integrators'
    determine_mass_damp_consistent_accelerations).  Call after setting
    nonzero initial displacements/velocities and before stepping.
    """
    from fourc_tpu.linalg import solvers as ls

    t0 = state["t"]
    d0 = f.dbc.apply(state["d"], t0)
    fint0, _ = f.internal_force(d0, history=state["hist"] or None)
    fext0 = f.external_force(t0, d0)
    rhs = f.dbc.mask(fext0 - fint0)
    if f.params.dyntype in ("statics",):
        a0 = jnp.zeros_like(d0)
    else:
        mlump = f.lumped_mass()
        if f.params.mass == "lumped":
            a0 = jnp.where(mlump > 0, rhs / jnp.maximum(mlump, 1e-300), 0.0)
        else:
            from fourc_tpu.linalg.precond import jacobi

            def Mop(v):
                w = f.dbc.free_w.astype(v.dtype)
                vm = w * v
                return w * f.mass_matvec(vm) + (1.0 - w) * v

            res = ls.cg(Mop, rhs, M=jacobi(jnp.maximum(mlump, 1e-300)),
                        tol=consistent_mass_tol, maxiter=200)
            a0 = f.dbc.mask(res.x)
    new = dict(state)
    new.update(d=d0, a=a0, fint=fint0, fext=fext0)
    return new


def make_zienxie_error_fn(f: "SolidField"):
    """A-posteriori local-error estimate for adaptive time stepping.

    Zienkiewicz-Xie: the leading local displacement error of a Newmark-
    family step vs the exact cubic is e = (beta - 1/6) dt^2 (a_{n+1}-a_n)
    (ref: src/timestepping/4C_timestepping_zienkiewicz_xie.cpp — same
    indicator driving the reference's TimAdaZienXie).  OST maps to
    Newmark with beta_eff = theta/2.  Returns per-dof RMS of e.
    """
    typ = f.params.dyntype
    if typ == "genalpha":
        beta = float(f.params.genalpha.beta)
    elif typ == "onesteptheta":
        beta = float(f.params.theta) / 2.0
    else:
        raise ValueError(
            f"Zienkiewicz-Xie adaptivity needs a dynamic Newmark-family "
            f"integrator (genalpha/onesteptheta), got dyntype={typ!r}")
    coef = abs(beta - 1.0 / 6.0)

    def error_fn(state_old, state_new, dt):
        da = state_new["a"] - state_old["a"]
        n = da.shape[0]
        return coef * dt * dt * float(jnp.linalg.norm(da)) / n**0.5

    return error_fn


def make_step(f: SolidField, dt: float | None = None):
    """Build the jitted step function for the configured integrator."""
    dt = float(dt if dt is not None else f.params.dt)
    typ = f.params.dyntype
    if getattr(f, "mortar_contact", None):
        from fourc_tpu.contact import mortar as _mc

        if typ == "statics":
            return _mc.make_statics_step(f, dt)  # self-orchestrating
        if typ == "genalpha":
            return _mc.make_genalpha_step(f, dt)
        raise NotImplementedError(
            "mortar-Lagrange contact supports statics and genalpha")
    elif typ == "statics":
        raw = _make_statics_step(f, dt)
    elif typ == "onesteptheta":
        raw = _make_ost_step(f, dt)
    elif typ == "genalpha":
        raw = _make_genalpha_step(f, dt)
        if f.params.host_newton or getattr(raw, "self_jitted", False):
            return raw  # orchestrates its own jitted programs
    elif typ in ("explicit", "explicit_central"):
        raw = _make_central_diff_step(f, dt)
    else:
        raise ValueError(f"unknown DYNAMICTYPE {typ!r}")
    if hasattr(f, "hoister"):
        return f.hoister.jit(raw)
    return jax.jit(raw)


def _static_precond(f: SolidField, mass_shift: float = 0.0):
    """State-independent preconditioner built once per step function (GMG /
    AMG); returns None when the per-state block-Jacobi is used instead."""
    if f.params.precond == "amg":
        return f._build_amg(mass_shift)
    if f.params.precond != "gmg":
        return None
    from fourc_tpu.linalg import gmg

    M = gmg.build_for_solid(f, mass_shift=mass_shift)
    if M is None:
        # general topology: fall back to SA-AMG (the multigrid the
        # reference's MueLu provides on any mesh), NOT block-Jacobi — the
        # Krylov iteration count triples without a multilevel hierarchy
        # (measured 214 vs ~70 its/step at 107k dofs, permuted box)
        import warnings

        warnings.warn("gmg preconditioner needs a structured single-block "
                      "mesh; falling back to SA-AMG")
        return f._build_amg(mass_shift)
    elif hasattr(f, "hoister"):
        for lv in M.levels:
            # NOTE: `free` (bool) is deliberately NOT hoisted — feeding a
            # packed-pred lattice array as a runtime program input crashes
            # the TPU worker (runtime layout fault, reproduced at n=72);
            # as a ~1MB compile-time literal it is harmless
            # w_wide/dinv_wide/mlump_wide are f32 0/1-or-real arrays (safe
            # as runtime inputs, unlike packed-pred bools)
            for nm in ("Xe", "Ke", "dinv", "mlump", "w",
                       "w_wide", "dinv_wide", "mlump_wide"):
                if getattr(lv, nm, None) is not None:
                    f.hoister.register_attr(lv, nm)
    return M


def _make_statics_step(f: SolidField, dt: float):
    M_gmg = _static_precond(f)
    con_on = f.contact is not None and f.contact.stateful
    if con_on:
        n_uz = max((p["uzawa_max_iter"] for p in f.contact.pairs
                    if p["strategy"] == "uzawa"), default=1)
        uz_tol = min((p["uzawa_tol"] for p in f.contact.pairs
                      if p["strategy"] == "uzawa"), default=0.0)

    def step(state):
        t1 = state["t"] + dt
        hist = state["hist"] or None
        d_old = state["d"]

        def residual_with(u, con):
            fi, _ = f.internal_force(u, history=hist, dt=dt, cstate=con,
                                     u_old=d_old)
            return fi - f.external_force(t1, u)

        u0 = f.dbc.apply(state["d"], t1)  # predictor: constdis + DBC at t_{n+1}
        M = M_gmg if M_gmg is not None else f.build_preconditioner(u0, history=hist, dt=dt)

        if not con_on:
            res_fn, spread = f._residual_xform(lambda u: residual_with(u, None))
            u, stats = newton_solve(res_fn, u0, f.dbc.free_w, M, f.params.newton)
            u = spread(u)
            con_new = None
        else:
            # augmented-Lagrange (Uzawa) outer loop: Newton solve at frozen
            # multipliers, then lam <- max(0, lam - pen*g), until the
            # multiplier update stalls (ref: Uzawa nonlinear solver,
            # 4C_constraint_solver / contact penalty-Uzawa strategy)
            xo = f.coords + d_old.reshape(-1, f.ndpn)

            def solve_once(u, con):
                res_fn, spread = f._residual_xform(lambda uu: residual_with(uu, con))
                u1, st = newton_solve(res_fn, u, f.dbc.free_w, M, f.params.newton)
                return spread(u1), st

            def uz_body(carry):
                u, con, k, _, _ = carry
                u1, st = solve_once(u, con)
                x = f.coords + u1.reshape(-1, f.ndpn)
                chg = f.contact.max_multiplier_change(x, con, xo)
                con1 = f.contact.update_state(x, con, xo)
                return (u1, con1, k + 1, chg, st)

            def uz_cond(carry):
                _, _, k, chg, _ = carry
                return jnp.logical_and(k < n_uz, chg > uz_tol)

            u0c, con0, k0, st0 = u0, state["con"], jnp.asarray(0), None
            # one priming iteration supplies the stats pytree structure
            u1, con1, k1, chg1, st1 = uz_body((u0c, con0, k0, jnp.asarray(jnp.inf, u0.dtype), None))
            u, con_new, _, _, stats = jax.lax.while_loop(
                uz_cond, uz_body, (u1, con1, k1, chg1, st1))

        fint_new, hist_new = f.internal_force(
            u, history=hist, dt=dt, cstate=con_new,
            u_old=d_old)
        new_state = dict(state)
        new_state.update(
            d=u, t=t1, step=state["step"] + 1, fint=fint_new,
            fext=f.external_force(t1, u), hist=hist_new or state["hist"],
        )
        if con_new is not None:
            new_state["con"] = con_new
        return new_state, stats

    return step


def _predict(kind: str, dt, d_n, v_n, a_n):
    """Displacement predictor for implicit dynamic steps.

    ref PREDICT (4C_structure_new_predict_generic/constdisvelacc): constdis
    keeps d_n; constvel extrapolates d_n + dt v_n; constvelacc adds the
    dt^2/2 a_n term.  tangdis (tangential-displacement) maps to constdis
    here: in the matrix-free Newton the very first iteration IS the
    tangential solve (K(d_n) du = -r with the new DBC applied), so the
    reference's separate predictor solve buys nothing.
    """
    if kind == "constvelacc":
        return d_n + dt * v_n + 0.5 * dt * dt * a_n
    if kind == "constvel":
        return d_n + dt * v_n
    return d_n  # constdis / tangdis


def _newmark_updates(f, dt, d_new, d_n, v_n, a_n, beta, gamma):
    a_new = (d_new - d_n) / (beta * dt * dt) - v_n / (beta * dt) - (0.5 - beta) / beta * a_n
    v_new = v_n + dt * ((1 - gamma) * a_n + gamma * a_new)
    return v_new, a_new


def _make_genalpha_step(f: SolidField, dt: float):
    ga = f.params.genalpha
    am, af, beta, gamma = ga.alpha_m, ga.alpha_f, ga.beta, ga.gamma
    ra, rb = f.params.rayleigh_alpha, f.params.rayleigh_beta
    M_gmg = _static_precond(f, mass_shift=(1 - am) / (beta * dt * dt))
    if f.params.host_newton:
        return _make_genalpha_step_host(f, dt, M_gmg)

    if f.params.wide:
        from fourc_tpu.physics import solid_lattice as _sl

        if _sl.eligible(f):
            wide_step = _sl.make_wide_genalpha_step(f, dt, M_gmg)
            if wide_step is not None:
                return wide_step  # self-jitted (make_step passes through)

    con_on = getattr(f, "contact", None) is not None and f.contact.stateful

    # fused Newton operator: on the lattice fast path the exact tangent
    # K(u) v + (1-am)/(beta dt^2) M v is ONE Pallas pass (half the HBM
    # sweeps of jvp-of-residual + separate mass stencil).  Only valid
    # when no other displacement-dependent term enters the residual.
    # OPT-IN (FOURC_FUSED_TANGENT=1): correct in interpret mode and at
    # small sizes, but the fused kernel currently produces NaN on real
    # TPU at 73^3 (same large-shape Mosaic fragility family as the
    # packed-pred fault, NOTES_ROUND2.md) — default stays on the proven
    # jvp + mass-stencil pair.
    import os as _os

    matvec_fn = None
    if (_os.environ.get("FOURC_FUSED_TANGENT", "0") == "1"
            and getattr(f, "_lattice_force", None) is not None
            and not (ra or rb) and f.contact is None and f.ties is None
            and not f.springs and not getattr(f, "embedded", ())
            and not f.constraints
            and all(nb.kind != "pressure" for nb, _, _, _ in f._neumann_data)):
        from fourc_tpu.ops import lattice as _lat

        _tan = _lat.make_tangent_flat(
            f.lattice, f._cell(next(iter(f.block_mat))),
            next(iter(f.block_mat.values())),
            mass_coef=(1 - am) / ((1 - af) * beta * dt * dt))
        if _tan is not None:
            def matvec_fn(u, v, _t=_tan, _fac=(1 - af)):
                return _fac * _t(u, v)

    def step(state):
        t1 = state["t"] + dt
        tm = (1 - af) * t1 + af * state["t"]
        d_n, v_n, a_n = state["d"], state["v"], state["a"]
        fint_n = state["fint"]
        hist = state["hist"] or None
        con = state.get("con") if con_on else None

        def residual(d_new):
            v_new, a_new = _newmark_updates(f, dt, d_new, d_n, v_n, a_n, beta, gamma)
            a_mid = (1 - am) * a_new + am * a_n
            fi, _ = f.internal_force(d_new, history=hist, dt=dt, cstate=con,
                                     u_old=d_n)
            fint_mid = (1 - af) * fi + af * fint_n
            r = f.mass_matvec(a_mid) + fint_mid - (
                (1 - af) * f.external_force(t1, d_new) + af * state["fext"]
            )
            if ra or rb:
                v_mid = (1 - af) * v_new + af * v_n
                r = r + ra * f.mass_matvec(v_mid)
                if rb:
                    # stiffness-proportional damping via jvp of fint at d_new
                    _, kv = jax.jvp(
                        lambda x: f.internal_force(x, history=hist, dt=dt)[0],
                        (d_new,), (v_mid,),
                    )
                    r = r + rb * kv
            return r

        u0 = f.dbc.apply(_predict(f.params.predictor, dt, d_n, v_n, a_n), t1)
        M = M_gmg if M_gmg is not None else f.build_preconditioner(
            u0, history=hist, dt=dt, mass_shift=(1 - am) / (beta * dt * dt))
        res_fn, spread = f._residual_xform(residual)
        u, stats = newton_solve(res_fn, u0, f.dbc.free_w, M, f.params.newton,
                                matvec_fn=matvec_fn)
        u = spread(u)

        v1, a1 = _newmark_updates(f, dt, u, d_n, v_n, a_n, beta, gamma)
        con_new = None
        if con_on:
            # one augmented-Lagrange multiplier + friction-history update per
            # step (generalized ALM over the time loop)
            x = f.coords + u.reshape(-1, f.ndpn)
            xo = f.coords + d_n.reshape(-1, f.ndpn)
            con_new = f.contact.update_state(x, con, xo)
        fint_new, hist_new = f.internal_force(u, history=hist, dt=dt,
                                              cstate=con_new,
                                              u_old=d_n)
        new_state = dict(state)
        new_state.update(
            d=u, v=v1, a=a1, t=t1, step=state["step"] + 1,
            fint=fint_new, fext=f.external_force(t1, u),
            hist=hist_new or state["hist"],
        )
        if con_new is not None:
            new_state["con"] = con_new
        return new_state, stats

    return step


def _make_genalpha_step_host(f: SolidField, dt: float, M_gmg):
    """Host-orchestrated gen-alpha step (see SolidParams.host_newton).

    Three compiled programs: residual+norm, preconditioned-CG linear solve
    (jvp tangent), finalize.  No history materials (bench-scale path).
    """
    from fourc_tpu.linalg import solvers as ls

    ga = f.params.genalpha
    am, af, beta, gamma = ga.alpha_m, ga.alpha_f, ga.beta, ga.gamma
    nw = f.params.newton
    wmask = f.dbc.free_w

    def _residual(u, aux):
        d_n, v_n, a_n, fint_n, fext_n, t1 = aux
        v_new, a_new = _newmark_updates(f, dt, u, d_n, v_n, a_n, beta, gamma)
        a_mid = (1 - am) * a_new + am * a_n
        fi, _ = f.internal_force(u, dt=dt)
        fint_mid = (1 - af) * fi + af * fint_n
        r = f.mass_matvec(a_mid) + fint_mid - (
            (1 - af) * f.external_force(t1, u) + af * fext_n
        )
        return wmask.astype(r.dtype) * r

    def residual_norm(u, aux):
        r = _residual(u, aux)
        return r, jnp.linalg.norm(r)

    def lin_solve(u, r, aux, eta):
        def A(v):
            w = wmask.astype(v.dtype)
            vm = w * v
            _, jv = jax.jvp(lambda x: _residual(x, aux), (u,), (vm,))
            return w * jv + (1.0 - w) * v

        M = M_gmg if M_gmg is not None else f.build_preconditioner(
            u, dt=dt, mass_shift=(1 - am) / (beta * dt * dt))
        # CG + V-cycle.  The V-cycle's level matvecs must run at full f32
        # (see gmg.py): with the TPU default bf16 matmul precision the
        # V-cycle is non-additive at ~1e-3 relative, which broke both CG
        # (divergence — perturbed M violates the fixed-SPD assumption) and
        # GMRES (silent claimed-vs-true residual divergence at ~1M dofs).
        # With f32 levels, CG's lockstep x/r recurrences keep the claimed
        # residual honest even at kappa ~ 1e6 where GMRES's end-of-cycle
        # reconstruction drifts by kappa*eps.
        res = ls.cg(A, -r, M=M, tol=eta, atol=0.0, maxiter=nw.lin_maxiter)
        du = wmask.astype(res.x.dtype) * res.x
        linres = jnp.linalg.norm(A(du) + r)  # ||A du - b||, b = -r
        return u + du, jnp.linalg.norm(du), res.iters, linres

    def finalize(u, state, t1):
        d_n, v_n, a_n = state["d"], state["v"], state["a"]
        v1, a1 = _newmark_updates(f, dt, u, d_n, v_n, a_n, beta, gamma)
        fint_new, _ = f.internal_force(u, dt=dt)
        fext_new = f.external_force(t1, u)
        new_state = dict(state)
        new_state.update(d=u, v=v1, a=a1, t=t1, step=state["step"] + 1,
                         fint=fint_new, fext=fext_new)
        return new_state

    def predict(state, t1):
        return f.dbc.apply(
            _predict(f.params.predictor, dt, state["d"], state["v"], state["a"]),
            t1)

    # separate compile units, all with hoisted field buffers
    residual_norm = f.hoister.jit(residual_norm)
    lin_solve = f.hoister.jit(lin_solve)
    finalize = f.hoister.jit(finalize)
    predict = f.hoister.jit(predict)

    def step(state):
        t1 = state["t"] + dt
        aux = (state["d"], state["v"], state["a"], state["fint"], state["fext"], t1)
        u = predict(state, t1)
        r, rnorm = residual_norm(u, aux)
        rnorm0 = float(rnorm)
        rnorm_f = rnorm0
        rprev = float("inf")
        k = 0
        lin_tot = 0
        dnorm = 0.0
        while k < nw.max_iter:
            tol = max(nw.tol_res, nw.tol_res_rel * rnorm0 if nw.tol_res_rel else 0.0)
            if rnorm_f <= tol:
                break
            if nw.stag_tol and k >= 2 and rnorm_f > nw.stag_tol * rprev:
                break
            eta = (min(max((rnorm_f / max(rnorm0, 1e-300)) ** 0.5, nw.lin_rtol), 1e-1)
                   if nw.lin_adaptive else nw.lin_rtol)
            u, dn, its, linres = lin_solve(u, r, aux, eta)
            lin_tot += int(its)
            dnorm = float(dn)
            r, rnorm = residual_norm(u, aux)
            import os as _os

            if _os.environ.get("FOURC_DEBUG_NEWTON"):
                print(f"  [host-newton] it {k + 1}: |r| {rnorm_f:.4e} -> "
                      f"{float(rnorm):.4e}  |du| {dnorm:.3e}  cg {int(its)}"
                      f"  |A du - b| {float(linres):.3e}", flush=True)
            rprev = rnorm_f
            rnorm_f = float(rnorm)
            k += 1
        tol = max(nw.tol_res, nw.tol_res_rel * rnorm0 if nw.tol_res_rel else 0.0)
        conv = rnorm_f <= tol
        if nw.stag_tol and not conv:
            conv = (rnorm_f > nw.stag_tol * rprev
                    and rnorm_f <= nw.stag_min_drop * max(rnorm0, 1e-300))
        stats = {
            "iters": jnp.asarray(k), "resnorm": jnp.asarray(rnorm_f),
            "dispnorm": jnp.asarray(dnorm), "lin_iters": jnp.asarray(lin_tot),
            "converged": jnp.asarray(bool(conv)),
        }
        return finalize(u, state, t1), stats

    return step


def _make_ost_step(f: SolidField, dt: float):
    th = f.params.theta
    M_gmg = _static_precond(f, mass_shift=1.0 / (th * dt * dt))

    def step(state):
        t1 = state["t"] + dt
        d_n, v_n, a_n = state["d"], state["v"], state["a"]
        fint_n, fext_n = state["fint"], state["fext"]
        hist = state["hist"] or None

        def residual(d_new):
            v_new = (d_new - d_n) / (th * dt) - (1 - th) / th * v_n
            a_mid = (v_new - v_n) / dt  # = theta a_{n+1} + (1-theta) a_n
            fi, _ = f.internal_force(d_new, history=hist, dt=dt)
            return (
                f.mass_matvec(a_mid)
                + th * fi + (1 - th) * fint_n
                - (th * f.external_force(t1, d_new) + (1 - th) * fext_n)
            )

        u0 = f.dbc.apply(_predict(f.params.predictor, dt, d_n, v_n, a_n), t1)
        M = M_gmg if M_gmg is not None else f.build_preconditioner(
            u0, history=hist, dt=dt, mass_shift=1.0 / (th * dt * dt))
        res_fn, spread = f._residual_xform(residual)
        u, stats = newton_solve(res_fn, u0, f.dbc.free_w, M, f.params.newton)
        u = spread(u)

        v1 = (u - d_n) / (th * dt) - (1 - th) / th * v_n
        a1 = (v1 - v_n) / (th * dt) - (1 - th) / th * a_n
        fint_new, hist_new = f.internal_force(u, history=hist, dt=dt)
        new_state = dict(state)
        new_state.update(
            d=u, v=v1, a=a1, t=t1, step=state["step"] + 1,
            fint=fint_new, fext=f.external_force(t1, u),
            hist=hist_new or state["hist"],
        )
        return new_state, stats

    return step


def _make_central_diff_step(f: SolidField, dt: float):
    """Explicit central difference with lumped mass (ref: explicit/)."""
    mlump = f.lumped_mass()
    minv = jnp.where(mlump > 0, 1.0 / jnp.maximum(mlump, 1e-300), 0.0)

    def step(state):
        t1 = state["t"] + dt
        hist = state["hist"] or None
        a = state["a"]
        v_half = state["v"] + 0.5 * dt * a
        d_new = state["d"] + dt * v_half
        d_new = f.dbc.apply(d_new, t1)
        fint, hist_new = f.internal_force(d_new, history=hist, dt=dt)
        fext = f.external_force(t1, d_new)
        a_new = f.dbc.free_w.astype(fint.dtype) * (minv * (fext - fint))
        v_new = v_half + 0.5 * dt * a_new
        new_state = dict(state)
        new_state.update(
            d=d_new, v=v_new, a=a_new, t=t1, step=state["step"] + 1,
            fint=fint, fext=fext, hist=hist_new or state["hist"],
        )
        stats = {"iters": jnp.asarray(0), "resnorm": jnp.asarray(0.0),
                 "dispnorm": jnp.asarray(0.0), "lin_iters": jnp.asarray(0),
                 "converged": jnp.asarray(True)}
        return new_state, stats

    return step
