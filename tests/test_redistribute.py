"""Contact-pair parallel redistribution (interface load balancing).

Analog of the reference's contact round-robin interface redistribution
(ref: src/contact/4C_contact_interface_roundrobin.cpp,
4C_contact_utils_parallel.cpp): the permutation must (a) exactly balance
active slaves over shard chunks and (b) leave the contact force unchanged
up to scatter-add summation order (FP addition is not associative, so where
several slave rows add into one master node the exact bits can depend on
the reduction order; here the equality assertion documents the currently
observed behavior on this backend, not a guarantee).
"""

import numpy as np
import pytest

from fourc_tpu.parallel.redistribute import (
    balanced_permutation, redistribute_contact, shard_active_counts)

pytestmark = pytest.mark.minimal


@pytest.mark.parametrize("n_shards", [2, 4, 8])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_balanced_permutation_exact_balance(n_shards, seed):
    rng = np.random.RandomState(seed)
    S = 64
    # heavily skewed activity: all actives clustered at the front
    n_act = rng.randint(1, S)
    act = np.zeros(S)
    act[:n_act] = 1.0
    rng.shuffle(act[: S // 3])  # partial shuffle keeps it skewed
    perm = np.asarray(balanced_permutation(act, n_shards))
    assert sorted(perm.tolist()) == list(range(S))  # valid permutation
    counts = shard_active_counts(act[perm], n_shards)
    assert counts.max() - counts.min() <= 1
    assert counts.sum() == act.sum()


def test_balanced_permutation_all_edge_cases():
    for act in (np.zeros(16), np.ones(16)):
        perm = np.asarray(balanced_permutation(act, 4))
        assert sorted(perm.tolist()) == list(range(16))


def test_rejects_indivisible():
    with pytest.raises(ValueError):
        balanced_permutation(np.ones(10), 4)


def _two_block_contact():
    """Small two-block penalty contact (lower block + upper block)."""
    from fourc_tpu.contact.penalty import ContactCondition, PenaltyContact
    from fourc_tpu.core import gridgen

    lo = gridgen.box(3, 3, 1, cell="hex8")
    hi = gridgen.box(3, 3, 1, cell="hex8", lo=(0, 0, 1.005),
                     hi=(1, 1, 2.005))
    coords = np.concatenate([np.asarray(lo.coords), np.asarray(hi.coords)])
    off = lo.n_nodes
    # upper block's node ids shift by the lower block's node count
    slave = np.asarray(hi.node_sets["zmin"]) + off
    master_faces = lo.face_sets["zmax"]  # lower-block ids need no offset
    cond = ContactCondition(slave_nodes=slave, master_faces=master_faces,
                            penalty=1e4)
    pc = PenaltyContact([cond], coords, ndpn=3)
    return pc, coords


def test_contact_force_invariant_under_redistribution():
    import jax.numpy as jnp

    pc, coords = _two_block_contact()
    # push the upper block down so a corner of the slave set penetrates:
    # a spatially clustered active set (the redistribution target case)
    x = np.array(coords)
    upper = x[:, 2] > 1.0
    x[upper, 2] -= 0.012 * x[upper, 0]  # tilted: only the x=1 edge penetrates
    x = jnp.asarray(x)
    f0 = np.asarray(pc.force(x))
    assert np.abs(f0).max() > 0  # contact is actually active

    # activity estimate: any nonzero slave force
    slave = np.asarray(pc.pairs[0]["slave"])
    act = (np.abs(f0[slave]).max(axis=1) > 0).astype(np.float64)
    assert 0 < act.sum() < act.shape[0]  # genuinely unbalanced input

    n_shards = 4
    st0 = pc.init_state()
    st = redistribute_contact(pc, [act], n_shards, cstate=st0)
    # per-shard active counts now balanced
    slave_new = np.asarray(pc.pairs[0]["slave"])
    sw = np.asarray(pc.pairs[0]["slave_w"]) if pc.pairs[0].get("slave_w") \
        is not None else np.ones(slave_new.shape[0])
    f_node = np.abs(np.asarray(f0)[slave_new]).max(axis=1)
    counts = shard_active_counts((f_node > 0) * sw, n_shards)
    assert counts.max() - counts.min() <= 1

    # force invariant up to scatter-add order (allclose; see module docstring)
    f1 = np.asarray(pc.force(x, cstate=st))
    np.testing.assert_allclose(f0, f1, rtol=1e-6, atol=1e-9)


def test_state_stays_aligned():
    import jax.numpy as jnp

    pc, coords = _two_block_contact()
    S = int(pc.pairs[0]["slave"].shape[0])
    st0 = pc.init_state()
    st0[0]["lam"] = jnp.arange(S, dtype=jnp.float32)  # tag each slave
    slave_before = np.asarray(pc.pairs[0]["slave"]).copy()
    act = np.zeros(S)
    act[: S // 3] = 1.0
    st = redistribute_contact(pc, [act], 4, cstate=st0)
    slave_after = np.asarray(pc.pairs[0]["slave"])
    lam_after = np.asarray(st[0]["lam"])
    # each slave keeps its own multiplier across the permutation
    pos = {int(s): i for i, s in enumerate(slave_before)}
    for i, s in enumerate(slave_after[: S]):
        assert lam_after[i] == pos[int(s)]
