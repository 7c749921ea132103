"""Geometric search: LBVH broad phase + matching octree.

Oracle is brute force: the BVH must return exactly the set of boxes that
overlap each query (ref capability: src/core/geometric_search —
ArborX-backed BVH collision search + matching octree node matching).
"""

import numpy as np
import pytest

from fourc_tpu.core.geomsearch import build_bvh, match_nodes, query_aabbs

pytestmark = pytest.mark.minimal


def _rand_boxes(rng, n, scale=1.0, size=0.1):
    c = rng.uniform(0, scale, (n, 3))
    e = rng.uniform(0.2 * size, size, (n, 3))
    return c - e, c + e


@pytest.mark.parametrize("n,q", [(1, 5), (2, 4), (37, 20), (256, 64)])
def test_bvh_matches_bruteforce(n, q):
    rng = np.random.RandomState(n)
    lo, hi = _rand_boxes(rng, n)
    qlo, qhi = _rand_boxes(rng, q, size=0.15)
    bvh = build_bvh(lo, hi)
    hits, counts = query_aabbs(bvh, qlo, qhi, max_hits=n)
    hits, counts = np.asarray(hits), np.asarray(counts)
    for i in range(q):
        brute = set(np.where(
            np.all((qlo[i] <= hi) & (qhi[i] >= lo), axis=1))[0])
        got = set(hits[i][hits[i] >= 0].tolist())
        assert got == brute
        assert counts[i] == len(brute)


def test_bvh_varying_extent_beam_vs_faces():
    """The ArborX use case the grid hash handles poorly: long thin boxes
    (beam segments) against small fat ones (solid faces)."""
    rng = np.random.RandomState(3)
    # 50 small boxes + 5 long thin ones
    lo1, hi1 = _rand_boxes(rng, 50, size=0.05)
    c = rng.uniform(0, 1, (5, 3))
    lo2 = c - np.array([0.5, 0.01, 0.01])
    hi2 = c + np.array([0.5, 0.01, 0.01])
    lo = np.concatenate([lo1, lo2])
    hi = np.concatenate([hi1, hi2])
    bvh = build_bvh(lo, hi)
    hits, counts = query_aabbs(bvh, lo, hi, max_hits=60)
    hits = np.asarray(hits)
    for i in range(lo.shape[0]):
        brute = set(np.where(
            np.all((lo[i] <= hi) & (hi[i] >= lo), axis=1))[0])
        assert set(hits[i][hits[i] >= 0].tolist()) == brute


def test_bvh_truncation_reports_true_count():
    lo = np.zeros((16, 3))
    hi = np.ones((16, 3))  # all identical -> every query hits all 16
    bvh = build_bvh(lo, hi)
    hits, counts = query_aabbs(bvh, lo[:1], hi[:1], max_hits=4)
    assert int(counts[0]) == 16  # true count signals overflow
    assert (np.asarray(hits[0]) >= 0).sum() == 4  # capacity respected


def test_match_nodes_permuted_and_missing():
    rng = np.random.RandomState(0)
    a = rng.uniform(-1, 1, (40, 3))
    perm = rng.permutation(40)
    b = a[perm] + rng.uniform(-1e-10, 1e-10, (40, 3))
    m = match_nodes(a, b, tol=1e-8)
    assert (b[m] - a).max() < 1e-9
    assert (m == np.argsort(perm)).all()
    # a point with no partner maps to -1
    a2 = np.concatenate([a, [[5.0, 5.0, 5.0]]])
    m2 = match_nodes(a2, b, tol=1e-8)
    assert m2[-1] == -1
    assert (m2[:-1] == m).all()


def test_match_nodes_2d():
    a = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    b = np.array([[1.0, 1.0], [0.0, 0.0], [1.0, 0.0]])
    assert match_nodes(a, b).tolist() == [1, 2, 0]
