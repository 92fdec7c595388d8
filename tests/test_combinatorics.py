"""Combinatorics-layer tests.

Oracles are the two σ-class identities (reference symtensor/base.py:140-145,
tested there at symtensor/tests/test_utils.py:79-88):
    Σ_σ s_σ · γ_σ = d^r          Σ_σ s_σ = C(d+r−1, r)
plus brute-force enumeration cross-checks of the gflat addressing.
"""

import itertools
import math

import numpy as np
import pytest

from symtensor_tpu.utils import combinatorics as comb


ALL_RD = [(r, d) for r in range(2, 7) for d in (1, 2, 3, 4, 6)] + [
    (2, 100),
    (3, 30),
    (8, 3),
    (8, 6),
]


def test_perm_classes_basic():
    assert comb.perm_classes(0) == ((),)
    assert comb.perm_classes(1) == ((1,),)
    assert comb.perm_classes(3) == ((3,), (2, 1), (1, 1, 1))
    # partitions count for rank 8 is 22
    assert len(comb.perm_classes(8)) == 22


def test_labels_roundtrip():
    assert comb.class_label((2, 1, 1)) == "iijk"
    assert comb.class_counts("iijk") == (2, 1, 1)
    assert comb.class_counts("jiik") == (2, 1, 1)  # letters don't matter
    for r in range(1, 8):
        for c in comb.perm_classes(r):
            assert comb.class_counts(comb.class_label(c)) == c


def test_class_of_index():
    assert comb.class_of_index((5, 0, 1, 0)) == (2, 1, 1)
    assert comb.class_of_index((2, 2, 2)) == (3,)


@pytest.mark.parametrize("rank,dim", [(r, d) for r in range(1, 9) for d in (1, 2, 3, 6, 30, 400)])
def test_sigma_class_identities(rank, dim):
    classes = comb.perm_classes(rank)
    sizes = [comb.class_size(c, dim) for c in classes]
    gammas = [comb.class_multiplicity(c) for c in classes]
    assert sum(s * g for s, g in zip(sizes, gammas)) == dim**rank
    assert sum(sizes) == comb.indep_size(rank, dim)


def test_colex_rank_small():
    # Brute-force: enumerate multisets, sort by colex key, compare ranks.
    for k in (1, 2, 3, 4):
        for d in (1, 2, 3, 5):
            msets = sorted(
                itertools.combinations_with_replacement(range(d), k),
                key=lambda t: tuple(reversed(t)),
            )
            for i, m in enumerate(msets):
                assert comb.colex_rank(m) == i
                assert comb.colex_unrank(i, k) == m
    # vectorized matches scalar
    arr = np.array(
        sorted(itertools.combinations_with_replacement(range(5), 3))
    )
    ranks = comb.colex_rank_array(arr)
    for row, rk in zip(arr, ranks):
        assert comb.colex_rank(tuple(row)) == rk


def test_multisets_colex_enumeration():
    for k in (0, 1, 2, 3):
        for d in (1, 2, 4):
            arr = comb.multisets_colex(d, k)
            assert arr.shape == (comb.multiset_count(d, k), k)
            for i, row in enumerate(arr):
                assert list(row) == sorted(row)
                assert comb.colex_rank(tuple(row)) == i


@pytest.mark.parametrize("rank,dim", ALL_RD)
def test_gflat_layout_bijection(rank, dim):
    lay = comb.gflat_layout(rank, dim)
    n = comb.indep_size(rank, dim)
    assert lay.n == n
    rep = lay.rep_indices()
    assert rep.shape == (n, rank)
    # rows ascending
    assert np.all(rep[:, 1:] >= rep[:, :-1])
    # position_array inverts enumeration: storage order positions are 0..n-1
    pos = lay.position_array(rep)
    assert np.array_equal(pos, np.arange(n))
    # scalar position agrees on a sample
    step = max(1, n // 50)
    for i in range(0, n, step):
        assert lay.position(tuple(rep[i])) == i
    # every multiset appears exactly once
    seen = {tuple(r) for r in rep}
    assert len(seen) == n


@pytest.mark.parametrize("rank,dim", [(2, 4), (3, 4), (4, 3), (5, 3), (6, 2)])
def test_gflat_covers_all_multisets(rank, dim):
    lay = comb.gflat_layout(rank, dim)
    expected = set(itertools.combinations_with_replacement(range(dim), rank))
    rep = lay.rep_indices()
    assert {tuple(r) for r in rep} == expected


def test_row_multiplicities():
    rows = np.array([[0, 0, 0], [0, 0, 1], [0, 1, 2], [1, 1, 1]])
    gam = comb.row_multiplicities(rows)
    assert list(gam) == [1, 3, 6, 1]
    # identity: sum of γ over all independent components = d^r
    for rank, dim in [(3, 4), (4, 3), (5, 2)]:
        rep = comb.gflat_layout(rank, dim).rep_indices()
        assert comb.row_multiplicities(rep).sum() == dim**rank


def test_class_id_of_rows():
    rows = np.array([[0, 0, 0], [0, 0, 2], [0, 1, 2]])
    ids = comb.class_id_of_rows(rows, 3)
    classes = comb.perm_classes(3)
    assert [classes[i] for i in ids] == [(3,), (2, 1), (1, 1, 1)]
    # per-class counts match class_size
    rank, dim = 4, 5
    rep = comb.gflat_layout(rank, dim).rep_indices()
    ids = comb.class_id_of_rows(rep, rank)
    for cid, c in enumerate(comb.perm_classes(rank)):
        assert (ids == cid).sum() == comb.class_size(c, dim)


def test_mono_recursion_tables():
    # Mono_k built through the tables equals brute-force monomials in colex.
    d, kmax = 5, 3
    x = np.random.default_rng(1).normal(size=d)
    mono = {0: np.ones(1)}
    for k in range(1, kmax + 1):
        par, mx = comb.mono_recursion_tables(d, k)
        mono[k] = mono[k - 1][par] * x[mx]
        expected = np.array(
            [np.prod(x[list(m)]) for m in comb.multisets_colex(d, k)]
        )
        np.testing.assert_allclose(mono[k], expected, rtol=1e-12)


def test_distinct_permutations():
    perms = list(comb.distinct_permutations((0, 0, 1)))
    assert sorted(perms) == [(0, 0, 1), (0, 1, 0), (1, 0, 0)]
    assert len(list(comb.distinct_permutations((1, 2, 3)))) == 6
    assert len(list(comb.distinct_permutations((1, 1, 1)))) == 1
