"""Boundary-condition containers + Dirichlet machinery.

Counterpart of the reference's ``Core::Conditions::Condition`` +
``Core::FE::Dbc`` (ref: src/core/fem/src/condition/4C_fem_condition.hpp,
4C_fem_discretization_utils.hpp:128) and its Neumann evaluation.  A
condition references a named node/face set of the Discretization and
carries per-component ONOFF/VAL/FUNCT exactly like the reference's input
(ref: deck sections "DESIGN SURF DIRICH CONDITIONS" etc.).

Dirichlet values are evaluated **inside jit** as u_D(t) so time-dependent
BCs cost nothing extra; the free/fixed split is a static boolean mask
compiled into the step (the TPU analog of `apply_dirichlet_to_system`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.core.functions import FunctionManager


@dataclass
class DirichletBC:
    nodes: np.ndarray  # node ids
    onoff: list  # per dof component: 1 = constrained
    val: list  # amplitude per component
    funct: list | None = None  # function id per component (None/0 = const 1)

    def __post_init__(self):
        self.nodes = np.asarray(self.nodes, dtype=np.int32)
        if self.funct is None:
            self.funct = [0] * len(self.onoff)


@dataclass
class NeumannBC:
    """Surface/line load. kind: 'traction' (fixed direction, per-component
    VAL*FUNCT) | 'pressure' (follower normal pressure, uses component 0)."""

    faces: object  # list[FaceBlock]
    onoff: list
    val: list
    funct: list | None = None
    kind: str = "traction"

    def __post_init__(self):
        if self.funct is None:
            self.funct = [0] * len(self.onoff)


@dataclass
class PointNeumannBC:
    nodes: np.ndarray
    onoff: list
    val: list
    funct: list | None = None

    def __post_init__(self):
        self.nodes = np.asarray(self.nodes, dtype=np.int32)
        if self.funct is None:
            self.funct = [0] * len(self.onoff)


@dataclass
class BodyForce:
    """Volume load per unit reference volume (VAL*FUNCT per component)."""

    val: list
    funct: list | None = None

    def __post_init__(self):
        if self.funct is None:
            self.funct = [0] * len(self.val)


class DirichletHandler:
    """Compiles a list of DirichletBCs into (free_mask, u_D(t)).

    Later conditions override earlier ones on shared nodes, matching the
    reference's hierarchy (point > line > surf > vol) when the deck reader
    appends them in that order.
    """

    def __init__(self, conds: list[DirichletBC], coords: np.ndarray, ndpn: int,
                 functions: FunctionManager):
        n_nodes = coords.shape[0]
        self.ndpn = ndpn
        fixed = np.zeros((n_nodes, ndpn), dtype=bool)
        # per constrained (node, comp): amplitude + function id
        amp = np.zeros((n_nodes, ndpn))
        fid = np.zeros((n_nodes, ndpn), dtype=np.int64)
        for c in conds:
            for k in range(min(ndpn, len(c.onoff))):
                if c.onoff[k]:
                    fixed[c.nodes, k] = True
                    amp[c.nodes, k] = c.val[k]
                    fid[c.nodes, k] = c.funct[k] or 0
        self.free_mask = jnp.asarray(~fixed.reshape(-1))
        self._fixed = fixed
        self._amp = amp
        self._fid = fid
        self._coords = coords
        self._functions = functions
        # group constrained dofs by function id so u_D(t) evaluates each
        # symbolic function once over its node batch
        self._groups = []
        for f in np.unique(fid[fixed]):
            sel = fixed & (fid == f)
            nodes, comps = np.nonzero(sel)
            self._groups.append(
                (
                    int(f),
                    jnp.asarray((nodes * ndpn + comps).astype(np.int32)),
                    jnp.asarray(coords[nodes]),
                    jnp.asarray(amp[nodes, comps]),
                    jnp.asarray(comps.astype(np.int32)),
                )
            )

    def values(self, t):
        """Prescribed-value vector u_D(t), zero on free dofs (jit-safe)."""
        n = self.free_mask.shape[0]
        out = jnp.zeros((n,))
        for f, dofs, xyz, amp, comps in self._groups:
            fn = self._functions.get(f)
            if len(fn.components) == 1:
                vals = amp * fn(xyz, t, component=0)
            else:
                allc = fn(xyz, t)  # (n, ncomp)
                vals = amp * jnp.take_along_axis(allc, comps[:, None], axis=1)[:, 0]
            out = out.at[dofs].set(vals)
        return out

    def rates(self, t):
        """Analytic time derivative d/dt u_D(t) of the prescribed values,
        zero on free dofs.  The reference applies the FUNCT's exact time
        derivative to the rate vector on Dirichlet rows (scatra/thermo
        ApplyDirichletBC with FAD time derivatives); the discrete update
        recursion only converges to it, leaving O(dt) ripples on ramped
        BCs.  Computed with jax jvp in t."""
        n = self.free_mask.shape[0]
        out = jnp.zeros((n,))
        t = jnp.asarray(t, jnp.result_type(float))
        for f, dofs, xyz, amp, comps in self._groups:
            fn = self._functions.get(f)
            if len(fn.components) == 1:
                def g(tt, fn=fn, xyz=xyz):
                    return fn(xyz, tt, component=0)
            else:
                def g(tt, fn=fn, xyz=xyz, comps=comps):
                    allc = fn(xyz, tt)
                    return jnp.take_along_axis(allc, comps[:, None], axis=1)[:, 0]
            _, dv = jax.jvp(g, (t,), (jnp.ones_like(t),))
            out = out.at[dofs].set(amp * dv)
        return out

    def apply_rates(self, udot, t):
        """Overwrite constrained dofs of a rate vector with d/dt u_D(t)."""
        w = self.free_w.astype(udot.dtype)
        return w * udot + (1.0 - w) * self.rates(t).astype(udot.dtype)

    @property
    def free_mask(self):
        return self._free_mask

    @free_mask.setter
    def free_mask(self, m):
        """Keep the eager f32 weight in sync with any external narrowing of
        the mask (meshtying slave dofs in physics/solid.py, resharding in
        parallel/sharding.py): a stale _free_w leaves condensed slave rows
        'free', which makes the assembled system singular (NaN in direct
        solves)."""
        self._free_mask = m
        # eager (never inside a trace — a lazily cached version would
        # capture a tracer); f32 0/1 weight for traced masking, see free_w
        self._free_w = jnp.asarray(m).astype(jnp.float32)

    @property
    def free_w(self):
        """f32 0/1 weight of free_mask — use for masking inside traced
        code instead of jnp.where(free_mask, ...): large packed-pred mask
        arrays fault the TPU runtime when composed with multiple Pallas
        kernels in one program (see linalg/gmg.py NOTE)."""
        return self._free_w

    def apply(self, u, t):
        """Overwrite constrained dofs with prescribed values."""
        w = self.free_w.astype(u.dtype)
        return w * u + (1.0 - w) * self.values(t).astype(u.dtype)

    def mask(self, r):
        """Zero constrained entries (residual projection)."""
        return self.free_w.astype(r.dtype) * r
