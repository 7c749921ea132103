"""Composite beam-in-solid field (fiber-reinforced structures).

Driver-side counterpart of the reference's beaminteraction problem setup
(ref: src/beaminteraction — beams and solids live in one coupled structural
system; the submodel evaluator adds the beam-to-solid tying contributions
to the global residual/stiffness).  Here the composite state vector stacks
[solid dofs (3/node) | beam dofs (6/node)], each sub-field evaluates its
own batched kernels, and the coupling penalty (coupling/beam_solid.py) adds
equal-and-opposite tie forces — the whole residual stays one jit-compatible
pure function, so Newton-Krylov and the standard integrators apply
unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class _CombinedDbc:
    def __init__(self, solid_dbc, beam_dbc, n_s):
        self.solid = solid_dbc
        self.beam = beam_dbc
        self.n_s = n_s
        self.free_mask = jnp.concatenate([solid_dbc.free_mask,
                                          beam_dbc.free_mask])

    def apply(self, u, t):
        return jnp.concatenate([self.solid.apply(u[:self.n_s], t),
                                self.beam.apply(u[self.n_s:], t)])

    def mask(self, u):
        return jnp.where(self.free_mask, u, 0.0)


class BeamSolidField:
    """Solid (hex) + beams (line2) + penalty volume mesh tying."""

    def __init__(self, solid_field, beam_field, penalty=1e4,
                 surface_contact=None):
        from fourc_tpu.coupling.beam_solid import BeamSolidCoupling

        self.solid = solid_field
        self.beam = beam_field
        self.params = solid_field.params
        self.n_s = solid_field.ndof
        self.n_b = beam_field.ndof
        self.ndof = self.n_s + self.n_b
        self.ndpn = solid_field.ndpn  # for views (solid part)
        self.disc = solid_field.disc
        self.coords = solid_field.coords
        self.functions = solid_field.functions
        self.dbc = _CombinedDbc(solid_field.dbc, beam_field.dbc, self.n_s)
        # beam-to-solid SURFACE contact (ref: src/geometry_pair line-to-
        # surface + beaminteraction beam-to-solid surface contact): beam
        # centerline nodes against the solid's deformed surface faces,
        # unilateral penalty at offset = beam cross-section radius.
        # Mutually exclusive with volume tying (external vs embedded beams).
        self.surf = None
        if surface_contact is not None:
            from fourc_tpu.particles.wall import ParticleWall

            sc = dict(surface_contact)
            self.surf = ParticleWall(
                sc["faces"], np.asarray(solid_field.disc.coords),
                np.asarray(beam_field.disc.coords),
                n_candidates=int(sc.get("candidates", 4)))
            self.surf_pen = float(sc.get("penalty", penalty))
            self.surf_radius = float(sc.get("radius", 0.0))
            self.surf_mu = float(sc.get("friction_mu", 0.0))
            self.tie = None
        else:
            solid_conn = next(iter(solid_field.dofmap.blocks.values())).conn
            self.tie = BeamSolidCoupling(
                np.asarray(beam_field.disc.coords),
                np.asarray(solid_field.disc.coords),
                np.asarray(solid_conn), penalty=penalty)

    def split(self, u):
        return u[:self.n_s], u[self.n_s:]

    def internal_force(self, u, history=None, dt=None, temps=None,
                       cstate=None, u_old=None):
        us, ub = self.split(u)
        fs, hist = self.solid.internal_force(us, history=history, dt=dt)
        fb, _ = self.beam.internal_force(ub)
        if self.surf is not None:
            xb = (jnp.asarray(self.beam.disc.coords)
                  + ub.reshape(-1, 6)[:, :3])
            wall_x = self.coords + us.reshape(-1, 3)
            zero_v = jnp.zeros_like(xb)
            radii = jnp.full((xb.shape[0],), self.surf_radius, u.dtype)
            fp, fw = self.surf.forces(xb, zero_v, radii, wall_x,
                                      jnp.zeros_like(wall_x),
                                      self.surf_pen,
                                      friction_mu=self.surf_mu)
            # internal-force convention: residual gets MINUS the force
            fs = fs - fw.reshape(-1)
            fb6 = jnp.zeros((self.n_b // 6, 6), u.dtype).at[:, :3].set(-fp)
            k_rot = 1e-6 * self.surf_pen
            fb6 = fb6.at[:, 3:].add(k_rot * ub.reshape(-1, 6)[:, 3:])
            fb = fb + fb6.reshape(-1)
            return jnp.concatenate([fs, fb]), hist
        ft_s, ft_b = self.tie.force(us.reshape(-1, 3),
                                    ub.reshape(-1, 6)[:, :3])
        fs = fs + ft_s.reshape(-1)
        fb6 = jnp.zeros((self.n_b // 6, 6), u.dtype).at[:, :3].set(ft_b)
        # ground the fiber rotation dofs weakly: positional-only ties leave
        # rigid-twist modes unconstrained (the reference's rotational
        # BTS-VMT variant couples them; here a small regularization)
        k_rot = 1e-6 * self.tie.k
        fb6 = fb6.at[:, 3:].add(k_rot * ub.reshape(-1, 6)[:, 3:])
        fb = fb + fb6.reshape(-1)
        return jnp.concatenate([fs, fb]), hist

    def external_force(self, t, u=None):
        us = ub = None
        if u is not None:
            us, ub = self.split(u)
        return jnp.concatenate([self.solid.external_force(t, us),
                                self.beam.external_force(t, ub)])

    def lumped_mass(self):
        return jnp.concatenate([self.solid.lumped_mass(),
                                self.beam.lumped_mass()])

    def mass_matvec(self, v):
        vs, vb = self.split(v)
        return jnp.concatenate([self.solid.mass_matvec(vs),
                                self.beam.mass_matvec(vb)])

    def _residual_xform(self, residual_fn):
        return residual_fn, lambda u: u

    def build_preconditioner(self, u=None, history=None, dt=None,
                             mass_shift=0.0):
        us = None if u is None else u[:self.n_s]
        Ms = self.solid.build_preconditioner(us, history=history, dt=dt,
                                             mass_shift=mass_shift)
        # beam part: Jacobi on K_beam diag + the tie penalty on coupled
        # translation dofs (a free-floating fiber alone is singular; the
        # tie is what anchors it — same reasoning as the reference's
        # coupled-system preconditioning)
        dm = self.beam.dofmap
        per = {}
        for key in dm.blocks:
            Kd = jnp.einsum("eii->ei", self.beam.block_K[key])
            if mass_shift:
                Kd = Kd + mass_shift * self.beam.block_M[key]
            per[key] = Kd
        diag = dm.scatter_add(per)
        dn = diag.reshape(-1, 6)
        if self.tie is not None:
            dn = dn.at[self.tie.beam_nodes, :3].add(self.tie.k)
            dn = dn.at[:, 3:].add(1e-6 * self.tie.k)
        else:
            dn = dn.at[:, :3].add(self.surf_pen)
            dn = dn.at[:, 3:].add(1e-6 * self.surf_pen)
        diag = jnp.where(self.beam.dbc.free_mask,
                         jnp.maximum(dn.reshape(-1), 1e-12), 1.0)
        dinv_b = 1.0 / diag

        def M(r):
            return jnp.concatenate([Ms(r[:self.n_s]),
                                    dinv_b * r[self.n_s:]])

        return M
