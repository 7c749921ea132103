"""Node-to-surface contact: penalty, augmented-Lagrange (Uzawa), Coulomb
friction — active-set via masking.

Counterpart of the reference's computational-contact module
(ref: src/contact — `CONTACT::AbstractStrategy` -> `PenaltyStrategy`
(4C_contact_penalty_strategy.*), `LagrangeStrategy` (semismooth active-set
`update_active_set_semi_smooth` 4C_contact_lagrange_strategy.cpp:3385),
Coulomb friction (4C_contact_friction_node.cpp); gap + normal evaluation in
4C_contact_integrator.cpp).

TPU-native design:
- broad phase ONCE at setup (host numpy): K candidate master faces per
  slave node by reference-configuration distance (the analog of the
  binary-tree search, ref: 4C_contact_binarytree.cpp) — fixed-shape arrays,
  re-jit-free; re-run on demand for large sliding
- narrow phase INSIDE the jitted residual: closest-point projection onto
  each candidate face (fixed-iteration Newton in the parametric coords),
  gap g = (x_s - x_proj) . n; candidates blended with a continuous
  partition of unity so the residual stays C^0 across face boundaries
- active set = max(0, .) masks in the residual; jax.jvp through the masked
  residual IS the consistent semismooth-Newton linearization (the
  derivative of the active branch), replacing the reference's hand-coded
  derivative maps (CoNode 'deriv' containers)
- normal traction:
    penalty   p_n = max(0, -pen * g)                    (PenaltyStrategy)
    uzawa     p_n = max(0, lam - pen * g)               (augmented Lagrange;
              lam updated per converged step / Uzawa iteration: the
              multiplier converges to the exact contact pressure, gap -> 0,
              replacing the reference's condensed dual-LM solve)
- Coulomb friction: elastic-predictor/return-mapping on the tangential
  traction with per-slave-node traction history (ref: FrictionNode slip/
  stick states); t_trial = P_t(t_old) + pen_t * Du_t,
  ||t|| <= mu * p_n (stick) else slip at the cone surface
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.contact.constitutivelaw import make_law


@dataclass
class ContactCondition:
    """Deck-level contact definition: slave nodes vs master faces."""

    slave_nodes: np.ndarray  # (S,) node ids
    master_faces: object  # list[FaceBlock] (quad4/tri3 faces)
    slave_faces: object = None  # list[FaceBlock] — tributary areas (Nitsche)
    penalty: float = 1e5
    n_candidates: int = 4
    strategy: str = "penalty"  # "penalty" | "uzawa" | "nitsche"
    friction_mu: float = 0.0  # Coulomb coefficient; 0 = frictionless
    penalty_t: float = 0.0  # tangential penalty (default: = penalty)
    uzawa_max_iter: int = 8  # outer multiplier updates (statics driver)
    uzawa_tol: float = 1e-8  # stop when max |pen*g| change below this
    wear_coeff: float = 0.0  # Archard wear coefficient k_w (0 = no wear)
    # regularized pressure-penetration law (contact/constitutivelaw.py;
    # ref src/contact_constitutivelaw): "linear" reproduces plain penalty
    law: str = "linear"
    law_params: dict = None
    # SELF-contact (ref: the reference's self-contact binary-tree search,
    # src/contact 4C_contact_selfcontact_binarytree.*): slave nodes and
    # master faces come from the SAME surface; the broad phase excludes
    # every face within the slave node's 1-ring surface adjacency so a
    # node never "contacts" its own neighborhood
    self_exclude: bool = False


class PenaltyContact:
    """Evaluates contact forces for a list of ContactConditions.

    Stateless forces for pure frictionless penalty; otherwise carries a
    contact-state pytree (multipliers + friction traction history) threaded
    through the time-step state dict.
    """

    def __init__(self, conds, coords: np.ndarray, ndpn: int):
        self.ndpn = ndpn
        self.pairs = []
        for c in conds:
            faces = []
            for fb in c.master_faces:
                conn = np.asarray(fb.conn)
                if conn.shape[1] not in (3, 4):
                    raise NotImplementedError("contact master faces must be tri3/quad4")
                if conn.shape[1] == 3:  # degenerate quad from tri
                    conn = np.concatenate([conn, conn[:, 2:3]], axis=1)
                faces.append(conn)
            mconn = np.concatenate(faces, axis=0)  # (F, 4)
            slave = np.asarray(c.slave_nodes, np.int32)
            # slave tributary areas (reference config) — turns the Nitsche
            # consistency TRACTION -sigma_nn into a nodal force
            area = np.ones(slave.shape[0])
            if c.slave_faces is not None:
                amap = np.zeros(coords.shape[0])
                for fb in c.slave_faces:
                    fc = np.asarray(fb.conn)
                    v1 = coords[fc[:, 1]] - coords[fc[:, 0]]
                    v2 = coords[fc[:, -1]] - coords[fc[:, 0]]
                    fa = np.linalg.norm(np.cross(v1, v2), axis=-1)
                    if fc.shape[1] == 3:
                        fa = 0.5 * fa
                    np.add.at(amap, fc.reshape(-1),
                              np.repeat(fa / fc.shape[1], fc.shape[1]))
                area = amap[slave]
            elif c.strategy == "nitsche":
                raise ValueError(
                    "Nitsche contact needs slave FACES (a face set) for "
                    "tributary areas")
            # broad phase: K nearest faces by reference centroid distance
            cent = coords[mconn].mean(axis=1)  # (F, d)
            d2 = ((coords[slave][:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            if c.self_exclude:
                # (a) exclude the 1-ring: faces sharing any node with a
                # face that contains the slave node; (b) exclude faces
                # that do not FACE the slave node's own surface patch
                # (reference-config normals opposing) — coplanar faces of
                # the same surface sheet would otherwise register
                # zero-gap "contact" and lock the sheet in-plane
                ring = {}
                for face in mconn:
                    for nd in face:
                        ring.setdefault(int(nd), set()).update(
                            int(x) for x in face)
                v1 = coords[mconn[:, 2]] - coords[mconn[:, 0]]
                v2 = coords[mconn[:, 3]] - coords[mconn[:, 1]]
                fn = np.cross(v1, v2)
                fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True),
                                 1e-30)
                node_n = np.zeros_like(coords, dtype=float)
                np.add.at(node_n, mconn.reshape(-1),
                          np.repeat(fn, mconn.shape[1], axis=0))
                nn = node_n[slave]
                nn /= np.maximum(np.linalg.norm(nn, axis=1, keepdims=True),
                                 1e-30)
                facing = (nn @ fn.T) < -0.3  # (S, F)
                d2[~facing] = np.inf
                for si, s in enumerate(slave):
                    near = ring.get(int(s), {int(s)})
                    hit = np.isin(mconn, list(near)).any(axis=1)
                    d2[si, hit] = np.inf
            K = min(c.n_candidates, mconn.shape[0])
            cand = np.argsort(d2, axis=1)[:, :K].astype(np.int32)  # (S, K)
            slave_w = None
            if c.self_exclude:
                # rows with fewer than K admissible faces: repeat the row's
                # best admissible face instead of letting an excluded
                # (1-ring) face slip in through argsort; slaves with NO
                # admissible face at all get zero contact weight
                rows_d2 = np.take_along_axis(d2, cand, axis=1)
                bad = ~np.isfinite(rows_d2)
                best = cand[:, :1]
                cand = np.where(bad, best, cand)
                slave_w = (~bad.all(axis=1)).astype(np.float64)
            self.pairs.append(
                dict(
                    slave=jnp.asarray(slave),
                    area=jnp.asarray(area),
                    mconn=jnp.asarray(mconn.astype(np.int32)),
                    cand=jnp.asarray(cand),
                    pen=float(c.penalty),
                    pen_t=float(c.penalty_t or c.penalty),
                    mu=float(c.friction_mu),
                    strategy=c.strategy,
                    uzawa_max_iter=int(c.uzawa_max_iter),
                    uzawa_tol=float(c.uzawa_tol),
                    kw=float(c.wear_coeff),
                    law=make_law(getattr(c, "law", "linear"),
                                 getattr(c, "law_params", None),
                                 float(c.penalty)),
                    # non-linear laws are PRESSURE-penetration relations
                    # (scaled by nodal tributary area); the linear default
                    # keeps classic nodal-spring penalty semantics
                    law_pressure=getattr(c, "law", "linear") != "linear",
                    slave_w=(None if slave_w is None
                             else jnp.asarray(slave_w)),
                )
            )
        self.stateful = any(p["mu"] > 0 or p["strategy"] == "uzawa"
                            or p["kw"] > 0 for p in self.pairs)
        # Nitsche needs the slave body's boundary stress (consistency term)
        self.needs_stress = any(p["strategy"] == "nitsche" for p in self.pairs)

    # -- state ---------------------------------------------------------------

    def init_state(self, dtype=jnp.float32):
        """Contact-state pytree: per pair a dict of per-slave arrays."""
        st = []
        for p in self.pairs:
            S = p["slave"].shape[0]
            st.append({
                "lam": jnp.zeros((S,), dtype),  # normal multiplier >= 0
                "tt": jnp.zeros((S, 3), dtype),  # friction traction (global)
                "w": jnp.zeros((S,), dtype),  # Archard wear depth
            })
        return st

    # -- forces ---------------------------------------------------------------

    def force(self, x_nodes, cstate=None, x_old=None, sig=None):
        """Contact nodal forces given CURRENT coordinates (n_nodes, d).

        cstate: pytree from init_state (None -> pure penalty, frictionless).
        x_old: coordinates at the last converged step (friction slip
        increment reference); required when friction is on.
        sig: (n_nodes, 3, 3) nodal Cauchy stress — required for Nitsche
        pairs (ref: NitscheStrategy, 4C_contact_nitsche_strategy.*): the
        contact traction is the CONSISTENT boundary stress -sigma_nn plus
        the gap stabilization, so a moderate stabilization parameter gives
        near-exact tractions instead of penalty penetration errors.

        Returns (n_nodes, d) forces (to be ADDED to the internal force,
        i.e. they enter the residual with a + sign on the slave side).
        """
        f = jnp.zeros_like(x_nodes)
        for i, p in enumerate(self.pairs):
            ps = None if cstate is None else cstate[i]
            f = f + _pair_force(x_nodes, p, ps, x_old, sig)[0]
        return f

    def update_state(self, x_nodes, cstate, x_old, sig=None):
        """Post-step state update: Uzawa multiplier + friction traction
        history (called once per converged step with the final geometry)."""
        new = []
        for i, p in enumerate(self.pairs):
            _, upd = _pair_force(x_nodes, p, cstate[i], x_old, sig)
            lam_new = upd["lam"] if p["strategy"] == "uzawa" else cstate[i]["lam"]
            new.append({"lam": lam_new, "tt": upd["tt"], "w": upd["w"]})
        return new

    def max_multiplier_change(self, x_nodes, cstate, x_old, sig=None):
        """max_i |lam_new - lam| over all pairs (Uzawa convergence test)."""
        out = jnp.asarray(0.0, x_nodes.dtype)
        for i, p in enumerate(self.pairs):
            if p["strategy"] != "uzawa":
                continue
            _, upd = _pair_force(x_nodes, p, cstate[i], x_old, sig)
            out = jnp.maximum(out, jnp.max(jnp.abs(upd["lam"] - cstate[i]["lam"])))
        return out


def _project_quad(xs, Xf, iters=4):
    """Closest-point projection of xs (d,) onto bilinear quad Xf (4, d).

    Fixed-iteration Newton in (xi, eta) in [-1,1]^2 (jit-static), returns
    (xi, eta, N, x_proj, normal).
    """

    def shape(xi, eta):
        N = 0.25 * jnp.stack([
            (1 - xi) * (1 - eta), (1 + xi) * (1 - eta),
            (1 + xi) * (1 + eta), (1 - xi) * (1 + eta),
        ])
        dN = 0.25 * jnp.stack([
            jnp.stack([-(1 - eta), -(1 - xi)]),
            jnp.stack([(1 - eta), -(1 + xi)]),
            jnp.stack([(1 + eta), (1 + xi)]),
            jnp.stack([-(1 + eta), (1 - xi)]),
        ])  # (4, 2)
        return N, dN

    xi = jnp.asarray(0.0, xs.dtype)
    eta = jnp.asarray(0.0, xs.dtype)
    for _ in range(iters):
        N, dN = shape(xi, eta)
        xp = N @ Xf  # (d,)
        t = dN.T @ Xf  # (2, d) tangents
        r = xs - xp
        # solve [t.t^T] dxi = t.r (2x2)
        A = t @ t.T
        b = t @ r
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        dxi = jnp.stack([
            (A[1, 1] * b[0] - A[0, 1] * b[1]),
            (A[0, 0] * b[1] - A[1, 0] * b[0]),
        ]) / jnp.where(det == 0, 1.0, det)
        xi = jnp.clip(xi + dxi[0], -1.0, 1.0)
        eta = jnp.clip(eta + dxi[1], -1.0, 1.0)
    N, dN = shape(xi, eta)
    xp = N @ Xf
    t = dN.T @ Xf
    n = jnp.cross(t[0], t[1])
    n = n / jnp.maximum(jnp.linalg.norm(n), 1e-30)
    return xi, eta, N, xp, n


def _pair_force(x, p, pstate, x_old, sig=None):
    """Forces + state update for one contact pair set.

    Candidate faces are blended with a CONTINUOUS partition of unity (an
    insideness measure of the clipped projection), never selected by
    argmax: selection would make the residual jump when a node sits over a
    shared face edge (ties at flat interfaces), which destroys Newton.

    Returns (nodal force array, {"lam": updated multiplier,
    "tt": updated friction traction}).
    """
    slave, mconn, cand = p["slave"], p["mconn"], p["cand"]
    pen, pen_t, mu_f = p["pen"], p["pen_t"], p["mu"]
    law = p.get("law") or (lambda delta: pen * jnp.maximum(0.0, delta))
    kw = p.get("kw", 0.0)
    lam = pstate["lam"] if pstate is not None else None
    tt_old = pstate["tt"] if pstate is not None else None
    w_old = pstate.get("w") if pstate is not None else None
    d = x.shape[1]
    if x_old is None:
        x_old = x  # no slip increment available (frictionless paths)

    nitsche = p["strategy"] == "nitsche"
    if nitsche and sig is None:
        raise ValueError("Nitsche contact requires nodal stresses (sig)")

    def per_slave(s, a_s, cands, lam_s, tt_s, w_s):
        xs = x[s]
        lscale = a_s if p.get("law_pressure") else 1.0
        sig_s = sig[s] if nitsche else None

        def per_cand(fidx):
            Xf = x[mconn[fidx]]  # (4, d)
            xi, eta, N, xp, n = _project_quad(xs, Xf)
            g = jnp.dot(xs - xp, n) + w_s  # Archard wear deepens the gap
            # smooth insideness measure of the (clipped) projection; >0 on
            # the closed face, decays to ~0 just outside -> continuous
            # partition across neighbouring faces
            tol = 0.02
            mu = jnp.maximum(0.0, 1.0 + tol - jnp.abs(xi)) * jnp.maximum(
                0.0, 1.0 + tol - jnp.abs(eta)
            )
            return g, mu, n, N

        g, mu, n, N = jax.vmap(per_cand)(cands)  # (K,), (K,), (K,d), (K,4)
        # weights independent of the active state (gating by activity would
        # re-introduce jumps when a candidate activates); clipped outside
        # projections carry mu <= tol so they barely dilute the partition
        w = mu / jnp.maximum(mu.sum(), 1e-30)
        near = (g > -0.5)  # depth guard against spurious far-side faces
        # per-candidate normal traction (smooth in u): the node-level
        # multiplier augments each candidate's penalty term; Nitsche
        # replaces the multiplier by the consistent boundary stress
        # -sigma_nn (theta = 0 'skew' variant; gamma = penalty input)
        if nitsche:
            # consistency term: boundary traction -sigma_nn times the
            # slave node's tributary area (force units, like pen * g)
            snn = jnp.einsum("kd,de,ke->k", n, sig_s, n)  # (K,)
            p_n = jnp.where(near, jnp.maximum(0.0, -snn * a_s - pen * g), 0.0)
        else:
            # regularized pressure-penetration law on delta = -g (linear
            # law == classic penalty; ref src/contact_constitutivelaw);
            # pressure laws integrate over the nodal tributary area
            p_n = jnp.where(near, jnp.maximum(0.0, lam_s + lscale * law(-g)),
                            0.0)  # (K,)
        p_node = jnp.sum(w * p_n)

        # --- Coulomb friction (elastic predictor / return mapping) ---------
        if mu_f > 0.0:
            nhat = jnp.einsum("k,kd->d", w, n)
            nhat = nhat / jnp.maximum(jnp.linalg.norm(nhat), 1e-30)
            dxs = xs - x_old[s]  # slave motion since last converged step
            dxm = jnp.einsum("k,ka,kad->d", w, N, x[mconn[cands]] - x_old[mconn[cands]])
            ds = dxs - dxm  # relative motion
            ds_t = ds - jnp.dot(ds, nhat) * nhat
            tt_p = tt_s - jnp.dot(tt_s, nhat) * nhat  # rotate old traction
            t_trial = tt_p + pen_t * ds_t
            tnorm = jnp.linalg.norm(t_trial)
            cap = mu_f * p_node
            scale = jnp.where(tnorm > cap, cap / jnp.maximum(tnorm, 1e-30), 1.0)
            t_t = t_trial * scale  # resists slave motion with -t_t below
            # Archard wear: dw = k_w * p_n * |plastic slip increment|
            # (ref: src/contact wear, 4C_contact_wear_*; slip = the
            # return-mapped part of the tangential motion)
            slip = jnp.maximum(tnorm - cap, 0.0) / pen_t
            w_inc = kw * p_node * slip
        else:
            t_t = jnp.zeros((d,), x.dtype)
            w_inc = jnp.asarray(0.0, x.dtype)

        fs = jnp.einsum("k,k,kd->d", w, p_n, n) - t_t  # force ON the slave
        # reaction: each candidate face takes back its own normal share plus
        # its partition of the friction force
        fr = -(w * p_n)[:, None, None] * N[..., None] * n[:, None, :] \
            + (w[:, None, None] * N[..., None]) * t_t[None, None, :]  # (K,4,d)
        # multiplier update (POST-step only — smoothness not required):
        # activity-weighted gap isolates the truly penetrated faces
        w_act = w * jnp.where(jnp.logical_or(g < 0.0, p_n > 0.0), 1.0, 0.0)
        ghat = jnp.sum(w_act * g) / jnp.maximum(jnp.sum(w_act), 1e-30)
        lam_new = jnp.maximum(0.0, lam_s + lscale * law(-ghat))
        return fs, fr, lam_new, t_t, w_s + w_inc

    S = slave.shape[0]
    lam_in = lam if lam is not None else jnp.zeros((S,), x.dtype)
    tt_in = tt_old if tt_old is not None else jnp.zeros((S, d), x.dtype)
    w_in = w_old if w_old is not None else jnp.zeros((S,), x.dtype)
    fs, fr, lam_new, tt_new, w_new = jax.vmap(per_slave)(
        slave, p["area"], cand, lam_in, tt_in, w_in)
    sw = p.get("slave_w")
    if sw is not None:
        # self-contact: slaves with no admissible opposing face carry no
        # contact (their padded candidates are placeholders only)
        fs = fs * sw[:, None]
        fr = fr * sw[:, None, None, None]
    f = jnp.zeros_like(x)
    f = f.at[slave].add(fs)
    mnodes = mconn[cand]  # (S, K, 4)
    f = f.at[mnodes.reshape(-1)].add(fr.reshape(-1, d))
    return f, {"lam": lam_new, "tt": tt_new, "w": w_new}
