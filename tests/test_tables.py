"""Device-table tests: traced position formula vs host formula, dense gather
round-trip structure, class partitions, monomial tables on device."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from symtensor_tpu.utils import combinatorics as comb
from symtensor_tpu.utils import tables as tb


@pytest.mark.parametrize("rank,dim", [(2, 7), (3, 5), (4, 4), (5, 3), (6, 3)])
def test_position_jnp_matches_host(rank, dim):
    t = tb.tables(rank, dim)
    rep = t.rep_np()
    pos = np.asarray(t.position_jnp(jnp.asarray(rep)))
    assert np.array_equal(pos, np.arange(t.n))
    # works under jit and vmap
    f = jax.jit(lambda i: t.position_jnp(i))
    assert int(f(jnp.asarray(rep[3]))) == 3


def test_dense_gather_structure():
    t = tb.tables(3, 4)
    g = np.asarray(t.dense_gather).reshape(4, 4, 4)
    # symmetric positions agree
    for i, j, k in itertools.product(range(4), repeat=3):
        assert g[i, j, k] == g[k, j, i] == g[j, i, k]
    # gather of rep positions is the identity
    rep = t.rep_np()
    flat = np.ravel_multi_index(tuple(rep.T), (4, 4, 4))
    assert np.array_equal(np.asarray(t.dense_gather)[flat], np.arange(t.n))


def test_multiplicity_and_classes():
    t = tb.tables(4, 5)
    gam = np.asarray(t.multiplicity)
    assert gam.sum() == 5**4
    total = 0
    for c in t.perm_classes:
        p = t.class_positions_np(c)
        assert len(p) == comb.class_size(c, 5)
        total += len(p)
        # all members of the class have the class's multiplicity
        if len(p):
            assert np.all(gam[p] == comb.class_multiplicity(c))
    assert total == t.n


def test_mono_tables_device():
    t = tb.tables(6, 5)
    x = jnp.asarray(np.random.default_rng(2).normal(size=5))
    mono = jnp.ones((1,), dtype=x.dtype)
    for k in range(1, 4):
        par, mx = t.mono_tables(k)
        mono = mono[par] * x[mx]
    expected = np.array(
        [np.prod(np.asarray(x)[list(m)]) for m in comb.multisets_colex(5, 3)]
    )
    np.testing.assert_allclose(np.asarray(mono), expected, rtol=1e-12)


def test_tri_pairs():
    t = tb.tables(4, 6)
    a, b = t.tri_pairs
    a, b = np.asarray(a), np.asarray(b)
    assert len(a) == comb.tri_size(6)
    assert np.all(a <= b)
    # row-major order with rows of decreasing length
    lay = comb.gflat_layout(2, 6)
    pos = lay.position_array(np.stack([a, b], axis=1))
    assert np.array_equal(pos, np.arange(len(a)))


def test_table_cache_identity():
    assert tb.tables(3, 5) is tb.tables(3, 5)
    t = tb.tables(3, 5)
    assert t.rep is t.rep  # memoized device array


@pytest.mark.slow  # exhaustive (K, d) sweep, ~40 s; CI runs it
def test_position_insert_matches_sort_rank():
    """Insert ranking (no sort, no per-element gathers) must agree with
    the sort-then-rank oracle for every rep x every inserted value."""
    import jax.numpy as jnp

    for K, d in [(1, 5), (2, 6), (3, 7), (4, 6), (5, 5), (6, 4)]:
        t = tb.tables(K, d)
        if K == 1:
            got = np.asarray(
                t.position_insert_jnp_T(jnp.zeros((0, 3), jnp.int32))
            )
            assert np.array_equal(got, np.broadcast_to(np.arange(d), (3, d)))
            continue
        reps = tb.tables(K - 1, d).rep_np().astype(np.int32)
        got = np.asarray(t.position_insert_jnp_T(jnp.asarray(reps.T)))
        n = reps.shape[0]
        full = np.concatenate(
            [
                np.broadcast_to(reps[:, :, None], (n, K - 1, d)),
                np.broadcast_to(
                    np.arange(d, dtype=np.int32)[None, None, :], (n, 1, d)
                ),
            ],
            axis=1,
        )
        full = np.sort(full, axis=1)
        ref = np.asarray(t.position_jnp_T(jnp.asarray(full.transpose(1, 0, 2))))
        assert np.array_equal(got, ref), (K, d)


@pytest.mark.slow  # exhaustive sweep, ~30 s; CI runs it
def test_position_base_matches_insert_for_tail_b():
    """Fused-leaf-emit base ranking: for ascending rep and any b >= max(rep),
    position(sort(rep u {b})) == base(rep) + b — children of one parent
    occupy consecutive gflat slots (ops/basis_change._fused_leaf_emit)."""
    import jax.numpy as jnp

    for K, d in [(2, 6), (3, 7), (4, 6), (5, 5), (6, 4), (7, 4), (8, 3)]:
        t = tb.tables(K, d)
        reps = tb.tables(K - 1, d).rep_np().astype(np.int32)
        base = np.asarray(t.position_base_jnp_T(jnp.asarray(reps.T)))
        ins = np.asarray(t.position_insert_jnp_T(jnp.asarray(reps.T)))
        mx = reps.max(axis=1) if K > 1 else np.zeros(len(reps), np.int32)
        for b in range(d):
            ok = b >= mx
            assert np.array_equal(
                (base + b)[ok], ins[ok, b]
            ), (K, d, b)
