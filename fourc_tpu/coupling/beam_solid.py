"""Beam-to-solid volume mesh tying (embedded fibers).

Counterpart of the reference's beam-interaction subsystem
(ref: src/beaminteraction — beam-to-solid volume meshtying submodel
4C_beaminteraction_submodel_evaluator_beamcontact/…_beam_to_solid_volume_
meshtying_*.cpp with src/geometry_pair line-to-volume projection
4C_geometry_pair_line_to_volume.*; positional penalty coupling variant).

TPU-native design: the geometric pairing (which solid element hosts each
beam node, at which parametric point) is resolved ONCE on the host in the
reference configuration — a line-to-volume projection by per-element
inverse isoparametric Newton — and baked into fixed gather indices +
shape-function weights.  The coupling force is then a pure batched penalty
term inside the jitted residual:

    f_pen = k * (u_beam - N(xi) u_solid_nodes)

applied equal-and-opposite (positional coupling; beam rotations remain
free, the reference's BTS-VMT 'positional' variant).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _locate_in_hex(point, Xe, iters=10):
    """Inverse trilinear map: world point -> parametric xi in the hex Xe
    (8, 3).  Returns (xi, inside)."""
    from fourc_tpu.core import cells

    cell = cells.get_cell("hex8")
    xi = np.zeros(3)
    for _ in range(iters):
        N = cell.eval_shape(xi)  # (8,)
        dN = cell.eval_shape_deriv(xi)  # (8, 3)
        r = N @ Xe - point
        J = dN.T @ Xe  # (3, 3) d x / d xi ... rows dxi? J[i,j]=sum dN[a,i]Xe[a,j]
        try:
            dxi = np.linalg.solve(J.T, -r)
        except np.linalg.LinAlgError:
            return xi, False
        xi = xi + dxi
        if np.linalg.norm(dxi) < 1e-12:
            break
    inside = np.all(np.abs(xi) <= 1.0 + 1e-8)
    return xi, inside


def pair_beam_nodes_to_solid(beam_coords, solid_coords, solid_conn):
    """For each beam node, find the hosting hex + shape weights.

    Returns (host_elem (B,), weights (B, 8)) — host_elem = -1 if outside.
    """
    from fourc_tpu.core import cells

    cell = cells.get_cell("hex8")
    conn = np.asarray(solid_conn)
    X = np.asarray(solid_coords)
    lo = X[conn].min(axis=1)  # (E, 3)
    hi = X[conn].max(axis=1)
    host = np.full(beam_coords.shape[0], -1, np.int32)
    wts = np.zeros((beam_coords.shape[0], conn.shape[1]))
    for b, p in enumerate(np.asarray(beam_coords)):
        cand = np.where(np.all((p >= lo - 1e-9) & (p <= hi + 1e-9), axis=1))[0]
        for e in cand:
            xi, inside = _locate_in_hex(p, X[conn[e]])
            if inside:
                host[b] = e
                wts[b] = cell.eval_shape(xi)
                break
    return host, wts


class BeamSolidCoupling:
    """Penalty positional tie between beam nodes and their host hexes."""

    def __init__(self, beam_coords, solid_coords, solid_conn, penalty=1e4):
        host, wts = pair_beam_nodes_to_solid(beam_coords, solid_coords,
                                             solid_conn)
        sel = host >= 0
        self.beam_nodes = jnp.asarray(np.where(sel)[0].astype(np.int32))
        self.host_conn = jnp.asarray(np.asarray(solid_conn)[host[sel]])
        self.wts = jnp.asarray(wts[sel])
        self.k = float(penalty)
        self.n_pairs = int(sel.sum())

    def force(self, u_solid, u_beam_t):
        """u_solid: (n_s, 3); u_beam_t: (n_b, 3) beam translations.
        Returns (f_solid (n_s, 3), f_beam (n_b, 3)) to ADD to internal
        forces (restoring: penalizes the mismatch)."""
        us_at_beam = jnp.einsum("bk,bkd->bd", self.wts,
                                u_solid[self.host_conn])
        gap = u_beam_t[self.beam_nodes] - us_at_beam  # (B, 3)
        fb = jnp.zeros_like(u_beam_t)
        fb = fb.at[self.beam_nodes].add(self.k * gap)
        fs = jnp.zeros_like(u_solid)
        fs = fs.at[self.host_conn.reshape(-1)].add(
            (-self.k * self.wts[..., None] * gap[:, None, :]).reshape(-1, 3))
        return fs, fb
