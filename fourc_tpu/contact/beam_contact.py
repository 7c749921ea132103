"""Beam-to-beam point contact (penalty).

Counterpart of the reference's beam contact
(ref: src/beamcontact + src/beaminteraction beam-to-beam pairs — closest-
point projection between beam centerlines, gap = d - r1 - r2, penalty
force along the connecting normal, 4C_beamcontact_beam3contact.*).

TPU-native: candidate segment pairs are found ONCE on the host in the
reference configuration (all-pairs or radius-filtered); the narrow phase
(clamped segment-segment closest point) runs batched inside the jitted
residual, with smooth max(0, -gap) penalty activation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _closest_params(p1, q1, p2, q2, eps=1e-12):
    """Clamped closest-point parameters (s, t) between segments
    [p1,q1] and [p2,q2]; batched over leading axes."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    den = a * e - b * b
    s = jnp.where(den > eps, (b * f - c * e) / jnp.maximum(den, eps), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = jnp.where(e > eps, (b * s + f) / jnp.maximum(e, eps), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    # re-clamp s for the clamped t
    s = jnp.where(a > eps, (b * t - c) / jnp.maximum(a, eps), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    return s, t


class BeamContact:
    """Penalty contact between line2 beam segments."""

    def __init__(self, coords, conn, radius, penalty=1e3, cutoff=None,
                 exclude_adjacent=True):
        conn = np.asarray(conn)
        X = np.asarray(coords)
        nE = conn.shape[0]
        pairs = []
        mid = X[conn].mean(axis=1)
        L = np.linalg.norm(X[conn[:, 1]] - X[conn[:, 0]], axis=1)
        cut = cutoff if cutoff is not None else (L.max() + 4 * radius)
        for i in range(nE):
            for j in range(i + 1, nE):
                if exclude_adjacent and len(
                        set(conn[i]).intersection(conn[j])):
                    continue
                if np.linalg.norm(mid[i] - mid[j]) < cut:
                    pairs.append((i, j))
        self.pairs = jnp.asarray(np.asarray(pairs, np.int32).reshape(-1, 2))
        self.conn = jnp.asarray(conn)
        self.r = float(radius)
        self.k = float(penalty)
        self.n_pairs = len(pairs)

    def force(self, x_nodes):
        """x_nodes (n, 3) current centerline positions -> (n, 3) forces."""
        f = jnp.zeros_like(x_nodes)
        if self.n_pairs == 0:
            return f
        ci = self.conn[self.pairs[:, 0]]
        cj = self.conn[self.pairs[:, 1]]
        p1, q1 = x_nodes[ci[:, 0]], x_nodes[ci[:, 1]]
        p2, q2 = x_nodes[cj[:, 0]], x_nodes[cj[:, 1]]
        s, t = _closest_params(p1, q1, p2, q2)
        a = p1 + s[:, None] * (q1 - p1)
        b = p2 + t[:, None] * (q2 - p2)
        d = a - b
        dist = jnp.sqrt(jnp.sum(d * d, -1) + 1e-30)
        gap = dist - 2.0 * self.r
        pmag = self.k * jnp.maximum(0.0, -gap)  # compression when gap < 0
        nrm = d / dist[:, None]
        fp = pmag[:, None] * nrm  # pushes beam i away from beam j
        # distribute to segment endpoints by the closest-point parameter
        f = f.at[ci[:, 0]].add((1 - s)[:, None] * fp)
        f = f.at[ci[:, 1]].add(s[:, None] * fp)
        f = f.at[cj[:, 0]].add(-(1 - t)[:, None] * fp)
        f = f.at[cj[:, 1]].add(-t[:, None] * fp)
        return f
