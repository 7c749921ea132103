"""Global structural constraints: enclosed volume + multipoint (MPC).

Counterpart of the reference's constraint module
(ref: src/constraint — volume/area constraint conditions with
penalty/Lagrange enforcement, `ConstraintSolver` 4C_constraint_solver.*;
multipoint constraints 4C_constraint_multipointconstraint*.*).

TPU-native: the constraint value (enclosed volume via the divergence
theorem over the boundary faces) is a pure function of the displacement
vector; the penalty restoring force is its AD gradient — no hand-derived
constraint matrices (the reference assembles them per condition).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class VolumeConstraint:
    """Penalty enforcement of V(u) = V0 * funct(t) over a closed surface.

    faces: list[FaceBlock] (outward-oriented quad4/tri3).
    """

    def __init__(self, faces, coords, ndpn, penalty, funct_id, functions,
                 enforcement="penalty"):
        from fourc_tpu.core.cells import get_cell

        self.ndpn = ndpn
        self.k = float(penalty)
        self.fn = functions.get(int(funct_id)) if funct_id else None
        # Lagrange enforcement (ref: the reference's ConstraintSolver
        # Uzawa/augmented strategies, 4C_constraint_solver.*): the
        # multiplier buffer is HOISTED into the jitted step, and the
        # driver's outer Uzawa loop updates it until |V - V_target| < tol
        # — exact enforcement without penalty-scale stiffness
        self.enforcement = str(enforcement)
        self.lam_buf = jnp.zeros(())
        self._faces = []
        for fb in faces:
            fc = get_cell(fb.cell)
            self._faces.append((fc, jnp.asarray(np.asarray(fb.conn))))
        self.coords = jnp.asarray(coords)
        self.V0 = float(self.volume(jnp.zeros(coords.shape[0] * ndpn)))

    def volume(self, u):
        """Enclosed volume V = (1/3) oint x . n dA (divergence theorem)."""
        from fourc_tpu.ops import common as gm

        x = self.coords + u.reshape(-1, self.ndpn)
        V = jnp.asarray(0.0, x.dtype)
        for fc, conn in self._faces:
            Xf = x[conn]
            dA, nrm = gm.surface_measure(Xf, fc.dN)
            xg = gm.interp_field(Xf, fc.N)  # (e, g, d)
            w = jnp.asarray(fc.gauss_weights, x.dtype)
            V = V + jnp.einsum("g,eg,egd,egd->", w, dA, xg, nrm) / 3.0
        return V

    def error(self, u, t):
        target = self.V0 * (self.fn(jnp.zeros((3,), u.dtype), t, component=0)
                            if self.fn is not None else 1.0)
        return self.volume(u) - target

    def force(self, u, t):
        """Constraint force (lam + k e) dV/du — penalty mode has lam = 0
        (enters like -f_ext)."""
        e = self.error(u, t)
        g = jax.grad(self.volume)(u)
        lam = self.lam_buf if self.enforcement == "lagrange" else 0.0
        return (lam + self.k * e) * g


class MultiPointConstraint:
    """Penalty MPC: sum_i c_i u[node_i, comp_i] = amplitude * funct(t)."""

    def __init__(self, nodes, comps, coeffs, ndpn, penalty, amplitude,
                 funct_id, functions, enforcement="penalty"):
        self.dofs = jnp.asarray(np.asarray(nodes, np.int64) * ndpn
                                + np.asarray(comps, np.int64))
        self.c = jnp.asarray(np.asarray(coeffs, float))
        self.k = float(penalty)
        self.amp = float(amplitude)
        self.fn = functions.get(int(funct_id)) if funct_id else None
        self.enforcement = str(enforcement)
        self.lam_buf = jnp.zeros(())

    def error(self, u, t):
        g = self.amp * (self.fn(jnp.zeros((3,), u.dtype), t, component=0)
                        if self.fn is not None else 1.0)
        return jnp.sum(self.c * u[self.dofs]) - g

    def force(self, u, t):
        e = self.error(u, t)
        lam = self.lam_buf if self.enforcement == "lagrange" else 0.0
        f = jnp.zeros_like(u)
        return f.at[self.dofs].add((lam + self.k * e) * self.c)
