"""Thermo-structure interaction (TSI).

Counterpart of the reference's TSI module (ref: src/tsi/4C_tsi_monolithic.cpp
— `TSI::Monolithic::newton_full()` :367-560 with 2x2 block system
[K_ss K_st; K_ts K_tt], `setup_system_matrix` :982; `TSI::Partitioned`
staggered scheme in 4C_tsi_partitioned.cpp; one-way variants).

TPU-native design: the monolithic tangent is never assembled as a block
matrix — the coupled residual

    r(y) = [ r_s(d, T) ;  w_t * r_t(T, d) ]       y = [d; T]

is one pure function of the stacked state, and the exact coupled Jacobian
action (including the off-diagonal K_st = d r_s/dT thermal-expansion block
and K_ts = d r_t/dd thermoelastic-heating block) is jax.jvp through it.
One Newton-Krylov loop on device replaces the reference's block-matrix +
Teko machinery; the field preconditioners act block-diagonally.

Physics (classic linear TSI, e.g. thermostvenantkirchhoff material):
  structure: div P(F, T) + b = rho a,  S += -(3 lam + 2 mu) alpha (T - T0) I
  thermo:    rho c Tdot = div(k grad T) - T0 (3 lam + 2 mu) alpha tr(eps_dot) + r
(ref: src/mat/4C_mat_thermostvenantkirchhoff.* for both coupling terms.)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from fourc_tpu.ops import common as gm
from fourc_tpu.physics import scalar_transport as st
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics.newton import newton_solve


@dataclass
class TsiParams:
    coupling: str = "monolithic"  # oneway|partitioned|monolithic
    dt: float = 1.0
    n_steps: int = 1
    itemax_outer: int = 20  # partitioned outer fixed-point iterations
    convtol_outer: float = 1e-8
    thermo_scale: float = 1.0  # weight of thermo residual in monolithic norm


class TsiField:
    """Solid + thermo fields on the same discretization (matching nodes,
    the reference's field-cloning setup)."""

    def __init__(self, solid: ps.SolidField, thermo: st.ScalarField, params: TsiParams):
        assert solid.disc.n_nodes == thermo.disc.n_nodes, "TSI needs cloned meshes"
        self.solid = solid
        self.thermo = thermo
        self.params = params
        self.nd = solid.ndof
        self.nt = thermo.ndof

    # -- coupling term helpers (per element block, at GPs) -----------------

    def temps_at_gps(self, T):
        """Nodal temperature -> {block: (e,g)} on the solid mesh."""
        out = {}
        for key in self.solid.dofmap.blocks:
            cell = self.solid._cell(key)
            conn = self.solid.dofmap.blocks[key].conn
            Te = T[conn]  # (e, nen)
            out[key] = jnp.einsum("ga,ea->eg", jnp.asarray(cell.N, T.dtype), Te)
        return out

    def heating_at_gps(self, v):
        """Gough-Joule thermoelastic heating source at GPs:
        -T0 (3 lam + 2 mu) alpha tr(eps_dot), from structure velocity v."""
        out = {}
        d = self.solid.ndpn
        for key in self.solid.dofmap.blocks:
            m = self.solid.block_mat[key]
            if getattr(m, "kind", "") != "thermo_solid":
                continue
            lam, mu = m._lame()
            c = (3.0 * lam + 2.0 * mu) * m.thexpans * m.inittemp
            cell = self.solid._cell(key)
            ve = self.solid.dofmap.gather(v, key)
            G, _ = gm.iso_gradients(self.solid.block_X[key], cell.dN)
            gv = gm.grad_field(ve, G)  # (e,g,d,d)
            trevdot = jnp.einsum("egii->eg", gv[..., :d, :d])
            out[key] = -c * trevdot
        return out

    # -- residuals ----------------------------------------------------------

    def split(self, y):
        return y[: self.nd], y[self.nd :]

    def join(self, d, T):
        return jnp.concatenate([d, T])

    @property
    def free_mask(self):
        return jnp.concatenate([self.solid.dbc.free_mask, self.thermo.dbc.free_mask])

    def block_precond(self, u0, dt, solid_mass_shift=0.0, thermo_dt_factor=0.0):
        Ms = self.solid.build_preconditioner(u0, mass_shift=solid_mass_shift, dt=dt)
        Mt = self.thermo.build_preconditioner(dt_factor=thermo_dt_factor)

        def M(r):
            rs, rt = self.split(r)
            return self.join(Ms(rs), Mt(rt))

        return M
