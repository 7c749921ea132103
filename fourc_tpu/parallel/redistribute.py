"""Parallel interface redistribution for contact pairs.

The TPU-native analog of the reference's contact-interface load balancing
(ref: src/contact/4C_contact_interface_roundrobin.cpp and
src/contact/src/4C_contact_utils_parallel.cpp): contact search/evaluation
cost concentrates wherever the active zone is, independently of the bulk
mesh partition, so the per-slave contact work must be re-dealt across
devices as the active set moves.

Design: the slave-node axis of every contact pair is a fixed-capacity
batched array (contact/penalty.py), sharded over the device mesh like any
other batch axis.  Rebalancing is therefore a PERMUTATION of that axis —
``balanced_permutation`` deals active slaves round-robin over the shard
chunks (exactly: per-chunk active counts differ by at most 1), the inactive
slaves fill the remaining slots in order.  The contact force is a
scatter-add keyed by the (permuted-along) global node ids, so the result is
invariant under the permutation up to scatter-add summation order (FP
addition is not associative, so when several slave rows hit the same master
node the reduction order — and hence the last few ulps — can depend on the
permutation and platform); only the per-device work balance changes.  ``redistribute_contact`` applies it host-side between jitted
phases (the same rare-reshard model as mesh repartitioning,
parallel/partition.py), matching the reference's every-N-steps round-robin
cadence rather than a per-iteration shuffle.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def balanced_permutation(active_w, n_shards: int):
    """Permutation spreading active entries evenly over contiguous chunks.

    active_w: (S,) 0/1 activity weights.  Float weights are used instead of
    a bool mask deliberately — large packed-pred tensors fault the TPU
    runtime near Pallas kernels (NOTES_ROUND2.md), so all masking in this
    codebase is arithmetic.

    S must be divisible by n_shards.  Returns perm (S,) int32 such that for
    x_new = x[perm], every contiguous chunk of S // n_shards entries holds
    either floor(n_active / n_shards) or ceil(n_active / n_shards) active
    entries.  Jittable (static shapes, no data-dependent control flow).
    """
    active_w = jnp.asarray(active_w)
    S = active_w.shape[0]
    if S % n_shards != 0:
        raise ValueError(f"S={S} not divisible by n_shards={n_shards}")
    chunk = S // n_shards
    a = (active_w > 0.5).astype(jnp.int32)
    ra = jnp.cumsum(a) - a          # rank among actives (valid where a==1)
    ri = jnp.cumsum(1 - a) - (1 - a)  # rank among inactives
    n_act = jnp.sum(a)
    s_idx = jnp.arange(n_shards, dtype=jnp.int32)
    # actives dealt round-robin: shard s receives a_s of them
    a_s = (n_act + n_shards - 1 - s_idx) // n_shards
    f_s = chunk - a_s  # free (inactive) slots in shard s
    F_s = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(f_s)[:-1].astype(jnp.int32)])
    dest_act = (ra % n_shards) * chunk + ra // n_shards
    sh = jnp.clip(jnp.searchsorted(F_s, ri, side="right") - 1, 0,
                  n_shards - 1)
    dest_inact = sh * chunk + a_s[sh] + (ri - F_s[sh])
    dest = a * dest_act + (1 - a) * dest_inact  # (S,) a permutation of 0..S-1
    return jnp.argsort(dest).astype(jnp.int32)


_PER_SLAVE_KEYS = ("slave", "area", "cand", "slave_w")


def redistribute_contact(contact, actives, n_shards: int, cstate=None):
    """Rebalance a PenaltyContact's per-slave arrays across device shards.

    contact: contact.penalty.PenaltyContact (mutated in place).
    actives: list of (S_i,) 0/1 activity weights, one per pair — e.g.
        ``lam > 0`` from the contact state, or a gap-based estimate.
    cstate: optional contact-state pytree (list of dicts of per-slave
        arrays); returned permuted to stay aligned with the pairs.

    Pads the slave axis with force-free entries (slave_w = 0) when its
    length is not a multiple of n_shards, so capacity growth is the only
    retrace trigger (fixed-capacity masking, SURVEY.md §7 hard parts).
    Returns the (possibly permuted) cstate.
    """
    new_state = [] if cstate is not None else None
    for i, p in enumerate(contact.pairs):
        act = np.asarray(actives[i], np.float64)
        S = act.shape[0]
        S_pair = int(np.asarray(p["slave"]).shape[0])
        if S != S_pair:
            raise ValueError(
                f"pair {i}: actives has length {S} but the pair's slave "
                f"axis has length {S_pair} — after a padding call, actives "
                f"must be supplied at the padded length")
        pad = (-S) % n_shards
        if pad:
            act = np.concatenate([act, np.zeros(pad)])
            sw = p.get("slave_w")
            sw = np.ones(S) if sw is None else np.asarray(sw, np.float64)
            p["slave_w"] = jnp.asarray(np.concatenate([sw, np.zeros(pad)]))
            for k in ("slave", "area", "cand"):
                arr = np.asarray(p[k])
                p[k] = jnp.asarray(
                    np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)]))
        perm = np.asarray(balanced_permutation(act, n_shards))
        for k in _PER_SLAVE_KEYS:
            if p.get(k) is not None:
                p[k] = jnp.asarray(np.asarray(p[k])[perm])
        if cstate is not None:
            st = cstate[i]
            st_np = {k: np.asarray(v) for k, v in st.items()}
            if pad:
                st_np = {k: np.concatenate(
                    [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                    for k, v in st_np.items()}
            new_state.append({k: jnp.asarray(v[perm])
                              for k, v in st_np.items()})
    return new_state


def shard_active_counts(active_w, n_shards: int) -> np.ndarray:
    """Per-chunk active counts (load-balance metric, rebalance.print analog
    of ref: core/rebalance/src/4C_rebalance_print.cpp)."""
    a = np.asarray(active_w) > 0.5
    return np.array([c.sum() for c in np.split(a, n_shards)])
