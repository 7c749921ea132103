"""Beam field: 6-dof-per-node structural dynamics on line2 elements.

Counterpart of the reference's beam time integration (beams run through the
same structure_new integrators; ref: src/beam3 + structure_new).  Statics,
gen-alpha and one-step-theta reuse the Newton-Krylov machinery; forces are
batched K·u products (ops/beam.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.core.conditions import DirichletHandler
from fourc_tpu.core.functions import FunctionManager
from fourc_tpu.core.mesh import Discretization
from fourc_tpu.ops import beam as ops
from fourc_tpu.physics.newton import newton_solve
from fourc_tpu.physics.solid import GenAlphaParams, SolidParams


class BeamField:
    """6 dofs/node: [u, theta]; materials must be beam sections."""

    def __init__(self, disc: Discretization, materials: dict, params: SolidParams,
                 dirichlet=(), point_neumann=(), beam_contact=None,
                 functions=None):
        self.disc = disc
        self.params = params
        self.functions = functions or FunctionManager()
        self.ndpn = 6
        self.dofmap = disc.dofmap(6)
        self.ndof = self.dofmap.ndof
        self.dbc = DirichletHandler(list(dirichlet), disc.coords, 6, self.functions)
        self.point_neumann = list(point_neumann)
        self.coords = jnp.asarray(disc.coords)

        self.contact = None
        if beam_contact:
            from fourc_tpu.contact.beam_contact import BeamContact

            bc = dict(beam_contact)
            conn = np.concatenate([np.asarray(b.conn)
                                   for b in disc.blocks.values()], axis=0)
            self.contact = BeamContact(disc.coords, conn,
                                       radius=float(bc["radius"]),
                                       penalty=float(bc.get("penalty", 1e3)))

        self.block_K = {}
        self.block_M = {}
        self.block_gex = {}  # geometrically exact force builders
        # small structural element zoo (ops/truss.py; ref src/truss3,
        # src/torsion3, src/rigidsphere): per-block (kind, Xe, mat)
        self.block_extra = {}
        for key, blk in disc.blocks.items():
            mat = materials[int(np.asarray(blk.mat_id)[0])]
            kind = getattr(mat, "kind", "beam")
            Xe = np.asarray(disc.coords)[np.asarray(blk.conn)]
            if kind in ("truss", "torsion_spring", "rigidsphere"):
                from fourc_tpu.ops import truss as tops

                self.block_extra[key] = (kind, jnp.asarray(Xe), mat)
                # lumped mass: truss rho*A*L/2 per node (translations);
                # sphere solid-sphere mass + rotational inertia
                nen = Xe.shape[1]
                Me = np.zeros((Xe.shape[0], nen * 6))
                if kind == "truss" and mat.density:
                    L = np.linalg.norm(Xe[:, 1] - Xe[:, 0], axis=1)
                    half = 0.5 * mat.density * mat.area * L
                    for a in range(2):
                        Me[:, a * 6:a * 6 + 3] = half[:, None]
                elif kind == "rigidsphere" and mat.density:
                    m, inertia = tops.sphere_mass(mat.radius, mat.density)
                    Me[:, 0:3] = m
                    Me[:, 3:6] = inertia
                self.block_M[key] = jnp.asarray(Me)
                continue
            if blk.cell != "line2":
                raise ValueError("BeamField beam blocks must be line2")
            Kg, Ls = ops.build_element_matrices(Xe, mat)
            self.block_K[key] = jnp.asarray(Kg)
            self.block_M[key] = ops.lumped_mass(jnp.asarray(Ls), mat)
            if getattr(mat, "formulation", "linear") == "reissner":
                from fourc_tpu.ops import beam_gex

                self.block_gex[key] = beam_gex.make_internal_force(Xe, mat)
            elif getattr(mat, "formulation", "linear") == "kirchhoff":
                # shear-free geometrically exact Kirchhoff beam (beam3k
                # counterpart, torsion-free Hermite variant; dof slots 3:6
                # carry the centerline TANGENT increment)
                from fourc_tpu.ops import beam_kirchhoff

                self.block_gex[key] = beam_kirchhoff.make_internal_force(
                    Xe, mat)

        # eager host-side precompute (as SolidField does): computing this
        # lazily inside a jitted trace would store a tracer on the object
        # and leak it into the next trace (UnexpectedTracerError).
        self._ml = self.lumped_mass()

    def internal_force(self, u, history=None, dt=None, temps=None,
                       cstate=None, u_old=None):
        dm = self.dofmap
        per_block = {}
        for key in dm.blocks:
            if key in self.block_extra:
                from fourc_tpu.ops import truss as tops

                kind, Xe, mat = self.block_extra[key]
                ue6 = dm.gather(u, key)  # (E, nen, 6)
                fe6 = jnp.zeros_like(ue6)
                if kind == "truss":
                    ft = tops.truss_force(Xe, ue6[:, :, :3], mat.ea)
                    fe6 = fe6.at[:, :, :3].set(ft)
                elif kind == "torsion_spring":
                    ft = tops.torsion_force(Xe, ue6[:, :, :3], mat.stiffness,
                                            mat.bend_potential)
                    fe6 = fe6.at[:, :, :3].set(ft)
                # rigidsphere: no internal force
                per_block[key] = fe6.reshape(fe6.shape[0], -1)
                continue
            if key in self.block_gex:
                ue6 = dm.gather(u, key)  # (E, 2, 6)
                fe = self.block_gex[key](ue6)
                per_block[key] = fe.reshape(fe.shape[0], -1)
                continue
            ue = dm.gather(u, key).reshape(-1, 12)
            per_block[key] = ops.internal_force(self.block_K[key], ue)
        f = dm.scatter_add(per_block)
        if self.contact is not None:
            x = self.coords + u.reshape(-1, 6)[:, :3]
            fc6 = jnp.zeros((self.disc.n_nodes, 6), u.dtype)
            fc6 = fc6.at[:, :3].set(self.contact.force(x))
            f = f - fc6.reshape(-1)
        return f, None

    def external_force(self, t, u=None):
        f = jnp.zeros((self.ndof,), self.coords.dtype)
        for pb in self.point_neumann:
            xyz = self.coords[jnp.asarray(pb.nodes)]
            for k in range(min(6, len(pb.onoff))):
                if pb.onoff[k]:
                    fn = self.functions.get(pb.funct[k])
                    vals = pb.val[k] * fn(xyz, t, component=0)
                    f = f.at[jnp.asarray(pb.nodes) * 6 + k].add(vals)
        return f

    def lumped_mass(self):
        dm = self.dofmap
        per_block = {key: self.block_M[key] for key in dm.blocks}
        return dm.scatter_add(per_block)

    def mass_matvec(self, v):
        return self._ml * v

    def _residual_xform(self, residual_fn):
        """No mesh tying on beam fields yet (shared step-builder hook)."""
        return residual_fn, lambda u: u

    def build_preconditioner(self, u=None, history=None, dt=None, mass_shift=0.0):
        from fourc_tpu.linalg.precond import jacobi

        # beams are slender 1D chains: the tangent condition grows like
        # (L/h)^2 (EA vs EI/L^2) and Jacobi-Krylov stalls.  For moderate
        # sizes, use the INVERSE of the assembled linear stiffness (exact
        # for the linear formulation, spectrally equivalent for Reissner)
        # — the analog of the reference's direct solver on beam problems.
        if self.ndof <= 6000:
            key_ = (round(float(mass_shift), 12),)
            cache = getattr(self, "_pc_cache", {})
            if key_ not in cache:
                K = np.zeros((self.ndof, self.ndof))
                for key, blk in self.dofmap.blocks.items():
                    conn = np.asarray(self.disc.blocks[key].conn)
                    nen = conn.shape[1]
                    dof = (conn[:, :, None] * 6 + np.arange(6)[None, None]) \
                        .reshape(-1, nen * 6)
                    if key in self.block_extra:
                        kind, Xe, mat = self.block_extra[key]
                        if kind == "truss":
                            # linear axial stiffness EA/L d⊗d (the u=0
                            # tangent) as the preconditioner block
                            Xe = np.asarray(Xe)
                            D = Xe[:, 1] - Xe[:, 0]
                            L = np.linalg.norm(D, axis=1)
                            dn = D / L[:, None]
                            kdd = (mat.ea / L)[:, None, None] * (
                                dn[:, :, None] * dn[:, None, :])
                            for e in range(dof.shape[0]):
                                for sa, sb, sgn in ((0, 0, 1), (1, 1, 1),
                                                    (0, 1, -1), (1, 0, -1)):
                                    ia = dof[e, sa * 6:sa * 6 + 3]
                                    ib = dof[e, sb * 6:sb * 6 + 3]
                                    K[np.ix_(ia, ib)] += sgn * kdd[e]
                    else:
                        Ke = np.asarray(self.block_K[key])  # (E, 12, 12)
                        for e in range(dof.shape[0]):
                            ix = dof[e]
                            K[np.ix_(ix, ix)] += Ke[e]
                    if mass_shift:
                        Me = np.asarray(self.block_M[key])
                        np.add.at(K, (dof.reshape(-1), dof.reshape(-1)),
                                  mass_shift * Me.reshape(-1))
                free = np.asarray(self.dbc.free_mask)
                K[~free, :] = 0.0
                K[:, ~free] = 0.0
                K[~free, ~free] = 1.0
                # dofs with no stiffness path (torsion-spring-only nodes,
                # rigid spheres in statics, truss rotations): identity rows
                zero = np.abs(np.diag(K)) < 1e-14
                K[zero, zero] = 1.0
                cache[key_] = jnp.asarray(np.linalg.inv(K))
                self._pc_cache = cache
            Kinv = cache[key_]
            return lambda r: Kinv @ r
        dm = self.dofmap
        per_block = {}
        for key in dm.blocks:
            if key in self.block_extra:
                kind, Xe, mat = self.block_extra[key]
                nen = Xe.shape[1]
                Kd = jnp.zeros((Xe.shape[0], nen * 6), self.coords.dtype)
                if kind == "truss":
                    L = jnp.linalg.norm(Xe[:, 1] - Xe[:, 0], axis=1)
                    ax = (mat.ea / L)[:, None]
                    for a in range(2):
                        Kd = Kd.at[:, a * 6:a * 6 + 3].set(ax)
            else:
                Kd = jnp.einsum("eii->ei", self.block_K[key])
            if mass_shift:
                Kd = Kd + mass_shift * self.block_M[key]
            per_block[key] = Kd
        diag = dm.scatter_add(per_block)
        diag = jnp.where(self.dbc.free_mask, jnp.maximum(diag, 1e-30), 1.0)
        return jacobi(diag)


def init_state(f: BeamField):
    want64 = jax.config.jax_enable_x64
    z = jnp.zeros((f.ndof,), jnp.float64 if want64 else jnp.float32)
    return {"d": z, "v": z, "a": z, "t": jnp.asarray(0.0, z.dtype),
            "step": jnp.asarray(0), "fint": z, "fext": z, "hist": {}}


def make_step(f: BeamField, dt: float | None = None):
    """Statics / gen-alpha steps sharing the solid integrators' update rules."""
    from fourc_tpu.physics import solid as ps

    dt = float(dt if dt is not None else f.params.dt)
    if f.params.dyntype == "statics":
        def step(state):
            t1 = state["t"] + dt

            def residual(u):
                return f.internal_force(u)[0] - f.external_force(t1, u)

            u0 = f.dbc.apply(state["d"], t1)
            M = f.build_preconditioner(u0)
            u, stats = newton_solve(residual, u0, f.dbc.free_mask, M, f.params.newton)
            new = dict(state)
            new.update(d=u, t=t1, step=state["step"] + 1)
            return new, stats

        return jax.jit(step)
    if f.params.dyntype == "genalpha":
        return jax.jit(ps._make_genalpha_step(f, dt))
    if f.params.dyntype == "onesteptheta":
        return jax.jit(ps._make_ost_step(f, dt))
    raise ValueError(f"beam dyntype {f.params.dyntype!r} not supported yet")
