"""Native (C++) table builders vs the NumPy reference implementations —
bit-identical outputs required."""

import numpy as np
import pytest

from symtensor_tpu import native
from symtensor_tpu.utils import combinatorics as comb

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native backend unavailable"
)


@pytest.mark.parametrize("rank,dim", [(2, 7), (3, 6), (4, 5), (5, 4), (6, 3), (6, 8)])
def test_gflat_rep_matches_numpy(rank, dim):
    lay = comb.gflat_layout(rank, dim)
    ref = lay.rep_indices()
    nat = native.gflat_rep(rank, dim)
    assert nat is not None
    assert np.array_equal(nat.astype(np.int64), ref)


@pytest.mark.parametrize("rank,dim", [(3, 5), (5, 4), (8, 3)])
def test_row_stats_match(rank, dim):
    rep = comb.gflat_layout(rank, dim).rep_indices()
    got = native.row_stats(rep, rank, comb.perm_classes(rank))
    assert got is not None
    gamma, cid = got
    assert np.array_equal(gamma, comb.row_multiplicities(rep).astype(np.float32))
    assert np.array_equal(cid.astype(np.int64), comb.class_id_of_rows(rep, rank))


@pytest.mark.parametrize("rank,dim", [(2, 9), (4, 5), (6, 4)])
def test_position_matches(rank, dim):
    lay = comb.gflat_layout(rank, dim)
    rep = lay.rep_indices()
    got = native.position(rep, rank, dim)
    assert got is not None
    assert np.array_equal(got, np.arange(lay.n))


@pytest.mark.parametrize("rank,dim", [(1, 6), (3, 4), (4, 3)])
def test_dense_gather_matches(rank, dim):
    got = native.dense_gather(rank, dim)
    assert got is not None
    shape = (dim,) * rank
    grids = np.indices(shape).reshape(rank, -1).T
    grids.sort(axis=1)
    if rank == 1:
        ref = grids[:, 0]
    else:
        ref = comb.gflat_layout(rank, dim).position_array(grids)
    assert np.array_equal(got.astype(np.int64), ref)


@pytest.mark.parametrize("k,dim", [(1, 6), (2, 5), (3, 4)])
def test_insert_table_matches(k, dim):
    rep = (
        comb.gflat_layout(k, dim).rep_indices()
        if k >= 2
        else np.arange(dim, dtype=np.int64)[:, None]
    )
    got = native.insert_table(rep, k, dim)
    assert got is not None
    lay1 = comb.gflat_layout(k + 1, dim)
    ref = np.empty((len(rep), dim), dtype=np.int64)
    for i in range(dim):
        cols = np.concatenate(
            [rep, np.full((len(rep), 1), i, dtype=np.int64)], axis=1
        )
        cols.sort(axis=1)
        ref[:, i] = lay1.position_array(cols)
    assert np.array_equal(got.astype(np.int64), ref)
