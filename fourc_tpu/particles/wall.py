"""Particle-wall interaction against a DISCRETIZED (FEM-surface) wall.

Counterpart of the reference's particle_wall module (ref:
src/particle_wall — wall discretization from the structure surface,
particle-wall contact force evaluation, and reaction transfer back to the
wall nodes; the core ingredient of PASI, src/pasi).

Design: fixed-K candidate faces per particle from the reference-config
broad phase (grid-free, like contact/penalty.py), closest-point projection
onto the deformed bilinear patches, spring-dashpot normal + Coulomb-capped
tangential contact, and shape-function-weighted reaction scatter onto the
wall nodes.  Everything static-shaped and vmapped — one fused XLA program
per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.contact.penalty import _project_quad


class ParticleWall:
    """Contact between spherical particles and a deforming FEM surface."""

    def __init__(self, face_blocks, coords, x_particles0, n_candidates=4):
        faces = []
        for fb in face_blocks:
            conn = np.asarray(fb.conn)
            if conn.shape[1] == 3:  # degenerate quad from tri
                conn = np.concatenate([conn, conn[:, 2:3]], axis=1)
            faces.append(conn)
        self.fconn = jnp.asarray(np.concatenate(faces, axis=0).astype(np.int32))
        # broad phase on the reference configuration: K nearest faces per
        # particle (stays valid for moderate wall/particle excursions; the
        # pasi driver rebuilds it per time step from current positions)
        self.n_candidates = n_candidates
        self.n_wall_nodes = coords.shape[0]
        self.cand = self.build_candidates(coords, x_particles0)

    def build_candidates(self, coords, xp):
        cent = np.asarray(coords)[np.asarray(self.fconn)].mean(axis=1)
        d2 = ((np.asarray(xp)[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        K = min(self.n_candidates, cent.shape[0])
        return jnp.asarray(np.argsort(d2, axis=1)[:, :K].astype(np.int32))

    def forces(self, xp, vp, radii, wall_x, wall_v, k_normal,
               damp_normal=0.0, friction_mu=0.0, k_tangential=0.0):
        """Returns (particle forces (N,3), wall nodal forces (n_nodes,3)).

        wall_x: DEFORMED wall node coordinates (n_nodes, 3); wall_v: wall
        node velocities (or zeros).
        """
        fconn, cand = self.fconn, self.cand

        def per_particle(x_i, v_i, r_i, cands):
            def per_face(fidx):
                Xf = wall_x[fconn[fidx]]  # (4, 3)
                xi, eta, N, xproj, n = _project_quad(x_i, Xf)
                # clamp the projection into the face
                inside = jnp.maximum(0.0, 1.02 - jnp.abs(xi)) * jnp.maximum(
                    0.0, 1.02 - jnp.abs(eta))
                gap = jnp.dot(x_i - xproj, n) - r_i
                # wall-side velocity at the projection point
                vw = jnp.einsum("a,ad->d", N, wall_v[fconn[fidx]])
                return gap, n, N, vw, inside

            gap, n, N, vw, mu_in = jax.vmap(per_face)(cands)
            w = mu_in / jnp.maximum(mu_in.sum(), 1e-30)
            pen = jnp.maximum(-gap, 0.0)
            vrel = v_i[None, :] - vw  # (K, 3)
            vn = jnp.einsum("kd,kd->k", vrel, n)
            fn = jnp.maximum(k_normal * pen - damp_normal
                             * jnp.where(pen > 0, vn, 0.0), 0.0)
            fvec = (w * fn)[:, None] * n  # (K, 3) on the particle
            if friction_mu > 0.0:
                vt = vrel - vn[:, None] * n
                vtn = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-30)
                kt = k_tangential or 0.1 * k_normal
                ftm = jnp.minimum(kt * vtn, friction_mu * fn)
                fvec = fvec - (w * ftm)[:, None] * vt / vtn[:, None]
            # reaction onto wall nodes: -fvec distributed by N
            fwall = -N[..., None] * fvec[:, None, :]  # (K, 4, 3)
            return jnp.sum(fvec, axis=0), fwall

        fp, fw = jax.vmap(per_particle)(xp, vp, radii, cand)
        wall_f = jnp.zeros((self.n_wall_nodes, 3), xp.dtype)
        wall_f = wall_f.at[fconn[cand]].add(fw)
        return fp, wall_f
