"""Exhaustive coverage proof for the insertion-depth slab decomposition.

docs/design_slab_gather.md verification plan: the slab set must cover
each (child multiset j, insertion value i) pair exactly once, with the
parent position equal to the sort-based oracle
colex_rank(sort(j ∪ {i})) — the same operator encoded by
tables.position_insert_jnp_T and ops/basis_change.py's insert maps.
"""

import itertools

import numpy as np
import pytest

from symtensor_tpu.utils import combinatorics as comb
from symtensor_tpu.utils import slabs


def oracle_pairs(k, d):
    """{(child_rank, i): parent_rank} for every pair, via sorting."""
    out = {}
    for j in itertools.combinations_with_replacement(range(d), k):
        cr = comb.colex_rank(j)
        for i in range(d):
            out[(cr, i)] = comb.colex_rank(tuple(sorted(j + (i,))))
    return out


@pytest.mark.parametrize(
    "k,d",
    [(0, 5), (1, 4), (1, 7), (2, 4), (2, 6), (3, 4), (3, 5), (4, 3),
     (5, 3)],
)
def test_slabs_cover_exactly_once(k, d):
    want = oracle_pairs(k, d)
    got = {}
    for s in slabs.iter_slabs(k, d):
        assert s.length >= 1
        for t in range(s.length):
            key = (s.child_start + t, s.i)
            assert key not in got, f"pair {key} covered twice"
            got[key] = s.parent_start + t
    assert got == want


@pytest.mark.parametrize("k,d", [(2, 5), (3, 6)])
def test_plan_split_matches_oracle(k, d):
    want = oracle_pairs(k, d)
    runs, tail = slabs.plan(k, d, min_run=3)
    got = {}
    for cs, i, ps, ln in runs:
        assert ln >= 3
        for t in range(ln):
            got[(cs + t, i)] = ps + t
    for cr, i, pp in tail:
        got[(cr, i)] = pp
    assert got == want


@pytest.mark.parametrize("k,d", [(1, 5), (2, 4), (3, 7), (4, 5)])
def test_plan_lex_matches_lex_oracle(k, d):
    # lex = combinations_with_replacement enumeration order (coincides
    # with the production gflat layout only for parent rank k+1 ≤ 3)
    lexrank = {
        m: i for i, m in enumerate(
            itertools.combinations_with_replacement(range(d), k + 1)
        )
    }
    want = {}
    for ci, j in enumerate(
        itertools.combinations_with_replacement(range(d), k)
    ):
        for i in range(d):
            want[(ci, i)] = lexrank[tuple(sorted(j + (i,)))]
    runs, tail = slabs.plan_lex(k, d, min_run=4)
    got = {}
    for cs, i, ps, ln in runs:
        assert ln >= 4
        for t in range(ln):
            key = (cs + t, i)
            assert key not in got
            got[key] = ps + t
    for cr, i, pp in tail:
        key = (int(cr), int(i))
        assert key not in got
        got[key] = int(pp)
    assert got == want


def test_plan_lex_is_production_layout_below_rank_4():
    # for parent rank ≤ 3 the gflat layout IS lex, so plan_lex drives
    # the production insert operator directly
    import jax.numpy as jnp

    from symtensor_tpu.utils.tables import tables

    k, d = 2, 5
    runs, tail = slabs.plan_lex(k, d, min_run=1)
    n_child = comb.multiset_count(d, k)
    n_par = comb.multiset_count(d, k + 1)
    parent = np.arange(n_par, dtype=np.float64) * 3.5 + 1
    G = np.zeros((n_child, d))
    for cs, i, ps, ln in runs:
        G[cs:cs + ln, i] = parent[ps:ps + ln]
    for cr, i, pp in tail:
        G[cr, i] = parent[pp]
    rep = np.asarray(tables(k, d).rep_np(), np.int32).reshape(n_child, k)
    sl = np.asarray(
        tables(k + 1, d).position_insert_jnp_T(jnp.asarray(rep.T))
    )
    assert np.array_equal(G, parent[sl])


@pytest.mark.parametrize("k,d", [(3, 5), (3, 7), (4, 5), (5, 6)])
def test_plan_gflat_d_matches_production_insert(k, d):
    # case D (i < g) must reproduce the PRODUCTION gflat insert
    # operator (position_insert_jnp_T) exactly on its pairs, and cover
    # every i < g pair exactly once
    import jax.numpy as jnp

    from symtensor_tpu.utils import combinatorics as comb2
    from symtensor_tpu.utils.tables import tables

    n_child = comb.multiset_count(d, k)
    rep = np.asarray(tables(k, d).rep_np(), np.int32).reshape(n_child, k)
    sl = np.asarray(
        tables(k + 1, d).position_insert_jnp_T(jnp.asarray(rep.T))
    )
    # production g per child row = component rank−3 of the SORTED rep
    g_of = rep[:, k - 3]
    want = {}
    for c in range(n_child):
        for i in range(int(g_of[c])):
            want[(c, i)] = int(sl[c, i])
    runs, tail = slabs.plan_gflat_d(k, d, min_run=4)
    got = {}
    for cs, i, ps, ln in runs:
        assert ln >= 4
        for t in range(ln):
            key = (int(cs + t), int(i))
            assert key not in got, f"dup {key}"
            got[key] = int(ps + t)
    for cr, i, pp in tail:
        key = (int(cr), int(i))
        assert key not in got, f"dup {key}"
        got[key] = int(pp)
    assert got == want


def test_plan_gflat_d_rejects_lex_ranks():
    with pytest.raises(ValueError):
        slabs.plan_gflat_d(2, 5)


@pytest.mark.parametrize("k,d", [(3, 5), (3, 7), (4, 5), (5, 6)])
def test_plan_gflat_c_matches_production_insert(k, d):
    # case C (g ≤ i < ta): whole child tail-row suffixes map onto the
    # tail sub-triangle of the parent group-i block
    import jax.numpy as jnp

    from symtensor_tpu.utils.tables import tables

    n_child = comb.multiset_count(d, k)
    rep = np.asarray(tables(k, d).rep_np(), np.int32).reshape(n_child, k)
    sl = np.asarray(
        tables(k + 1, d).position_insert_jnp_T(jnp.asarray(rep.T))
    )
    g_of, ta_of = rep[:, k - 3], rep[:, k - 2]
    want = {}
    for c in range(n_child):
        for i in range(int(g_of[c]), int(ta_of[c])):
            want[(c, i)] = int(sl[c, i])
    runs, tail = slabs.plan_gflat_c(k, d, min_run=4)
    got = {}
    for cs, i, ps, ln in runs:
        assert ln >= 4
        for t in range(ln):
            key = (int(cs + t), int(i))
            assert key not in got, f"dup {key}"
            got[key] = int(ps + t)
    for cr, i, pp in tail:
        key = (int(cr), int(i))
        assert key not in got, f"dup {key}"
        got[key] = int(pp)
    assert got == want


def test_plan_gflat_d_and_c_are_disjoint_and_cover_below_ta():
    # together D (i < g) and C (g ≤ i < ta) cover exactly the i < ta
    # incidences
    k, d = 4, 6
    n_child = comb.multiset_count(d, k)
    from symtensor_tpu.utils.tables import tables

    rep = np.asarray(tables(k, d).rep_np(), np.int64).reshape(n_child, k)
    covered = set()
    for runs, tail in (slabs.plan_gflat_d(k, d, 3),
                       slabs.plan_gflat_c(k, d, 3)):
        for cs, i, ps, ln in runs:
            for t in range(ln):
                key = (int(cs + t), int(i))
                assert key not in covered
                covered.add(key)
        for cr, i, pp in tail:
            key = (int(cr), int(i))
            assert key not in covered
            covered.add(key)
    want = {
        (c, i) for c in range(n_child) for i in range(int(rep[c, k - 2]))
    }
    assert covered == want


@pytest.mark.parametrize("k,d", [(3, 5), (3, 7), (4, 5), (5, 6)])
def test_plan_gflat_a_b_match_production_insert(k, d):
    # cases A (i ≥ tb, patches) and B (ta ≤ i < tb, transposed-role
    # runs) read the same parent tri block; each must match the
    # production operator exactly on its own pairs
    import jax.numpy as jnp

    from symtensor_tpu.utils.tables import tables

    n_child = comb.multiset_count(d, k)
    rep = np.asarray(tables(k, d).rep_np(), np.int32).reshape(n_child, k)
    sl = np.asarray(
        tables(k + 1, d).position_insert_jnp_T(jnp.asarray(rep.T))
    )
    ta_of, tb_of = rep[:, k - 2], rep[:, k - 1]

    want_a = {}
    want_b = {}
    for c in range(n_child):
        for i in range(int(ta_of[c]), d):
            if i >= int(tb_of[c]):
                want_a[(c, i)] = int(sl[c, i])
            else:
                want_b[(c, i)] = int(sl[c, i])

    got_a = {}
    for cs, i, ps in slabs.expand_patches_a(slabs.plan_gflat_a(k, d)):
        key = (int(cs), int(i))
        assert key not in got_a, f"dup {key}"
        got_a[key] = int(ps)
    assert got_a == want_a

    runs, tail = slabs.plan_gflat_b(k, d, min_run=3)
    got_b = {}
    for cs, i, ps, ln in runs:
        assert ln >= 3
        for t in range(ln):
            key = (int(cs + t), int(i))
            assert key not in got_b, f"dup {key}"
            got_b[key] = int(ps + t)
    for cr, i, pp in tail:
        key = (int(cr), int(i))
        assert key not in got_b
        got_b[key] = int(pp)
    assert got_b == want_b


def test_gflat_four_cases_partition_all_incidences():
    # D ∪ C ∪ B ∪ A must cover every (child, i) pair exactly once and
    # reproduce the production operator in full
    import jax.numpy as jnp

    from symtensor_tpu.utils.tables import tables

    k, d = 4, 6
    n_child = comb.multiset_count(d, k)
    rep = np.asarray(tables(k, d).rep_np(), np.int32).reshape(n_child, k)
    sl = np.asarray(
        tables(k + 1, d).position_insert_jnp_T(jnp.asarray(rep.T))
    )
    want = {
        (c, i): int(sl[c, i]) for c in range(n_child) for i in range(d)
    }
    got = {}

    def add(key, val):
        assert key not in got, f"dup {key}"
        got[key] = val

    for planner in (slabs.plan_gflat_d, slabs.plan_gflat_c,
                    slabs.plan_gflat_b):
        runs, tail = planner(k, d, 3)
        for cs, i, ps, ln in runs:
            for t in range(ln):
                add((int(cs + t), int(i)), int(ps + t))
        for cr, i, pp in tail:
            add((int(cr), int(i)), int(pp))
    for cs, i, ps in slabs.expand_patches_a(slabs.plan_gflat_a(k, d)):
        add((int(cs), int(i)), int(ps))
    assert got == want


def test_coverage_accounting():
    frac, n_runs, n_tail = slabs.coverage(3, 20, min_run=8)
    total = comb.multiset_count(20, 3) * 20
    # fraction + tail must account for every incidence (asserted inside
    # coverage()); DMA-rate share should dominate at realistic shapes
    assert 0.5 < frac <= 1.0
    assert n_tail < total


def test_closed_form_coverage_matches_enumeration():
    # the memoized (kk, i_up)-bucketed closed form must agree with the
    # explicit slab enumeration
    for k, d, mr in [(2, 6, 3), (3, 5, 4), (3, 8, 8)]:
        frac, n_runs, n_tail = slabs.coverage(k, d, min_run=mr)
        n_r = n_re = n_t = 0
        for s in slabs.iter_slabs(k, d):
            if s.length >= mr:
                n_r += 1
                n_re += s.length
            else:
                n_t += s.length
        assert n_runs == n_r
        assert n_tail == n_t
        assert frac == n_re / (n_re + n_t)


def test_coverage_headline_shapes():
    # measured calibration (committed numbers, see design doc): runs of
    # ≥64 elements at min_rows=128 cover 50% (k=3), 60% (k=4), 67%
    # (k=5) of incidences at dim 100, with descriptor counts ~2500×
    # below element counts
    for k, want in [(3, 0.50), (4, 0.59), (5, 0.65)]:
        frac, n_runs, n_tail = slabs.coverage(k, 100, min_run=64,
                                              min_rows=128)
        total = comb.multiset_count(100, k) * 100
        assert frac > want
        # descriptor count must stay far below the element count or the
        # decomposition buys nothing (issue rate ~0.4M descriptors/s)
        assert n_runs < total // 1000
