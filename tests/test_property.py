"""Property-based fuzzing (what the reference aspired to but never added —
SURVEY.md §4 item 5): index round-trips, layout bijectivity, op identities."""

import math

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st_

import symtensor_tpu as st
from symtensor_tpu.utils import combinatorics as comb

ranks = st_.integers(min_value=2, max_value=7)
dims = st_.integers(min_value=1, max_value=12)


@given(rank=ranks, dim=dims, data=st_.data())
@settings(max_examples=60, deadline=None)
def test_position_roundtrip(rank, dim, data):
    idx = tuple(
        sorted(
            data.draw(
                st_.lists(
                    st_.integers(0, dim - 1), min_size=rank, max_size=rank
                )
            )
        )
    )
    lay = comb.gflat_layout(rank, dim)
    pos = lay.position(idx)
    assert 0 <= pos < lay.n
    # invert via the rep table
    rep = lay.rep_indices()
    assert tuple(rep[pos]) == idx


@given(rank=st_.integers(1, 6), dim=st_.integers(1, 10), data=st_.data())
@settings(max_examples=40, deadline=None)
def test_element_class_consistency(rank, dim, data):
    idx = tuple(
        data.draw(
            st_.lists(st_.integers(0, dim - 1), min_size=rank, max_size=rank)
        )
    )
    A = st.FlatSymmetricTensor(
        rank=rank,
        dim=dim,
        data=jnp.arange(comb.indep_size(rank, dim), dtype=jnp.float64),
    )
    # every permutation of idx reads the same element
    v0 = float(A[idx])
    assert v0 == float(A[tuple(reversed(idx))])
    assert v0 == float(A[tuple(sorted(idx))])
    # the element appears in its class's value vector
    label = comb.class_label(comb.class_of_index(idx))
    assert v0 in np.asarray(A[label]).reshape(-1)


@given(
    rank=st_.integers(1, 5),
    dim=st_.integers(1, 8),
    seed=st_.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_colex_rank_unrank(rank, dim, seed):
    rng = np.random.default_rng(seed)
    idx = tuple(sorted(rng.integers(0, dim, size=rank)))
    r = comb.colex_rank(idx)
    assert comb.colex_unrank(r, rank) == idx


def _random_sym_dense(rank, dim, rng):
    from symtensor_tpu.ops.symmetrize import symmetrize

    return symmetrize(jnp.asarray(rng.normal(size=(dim,) * rank)))


@given(
    rank=st_.integers(2, 4),
    dim=st_.integers(2, 5),
    dim_out=st_.integers(1, 5),
    seed=st_.integers(0, 2**31 - 1),
)
@settings(max_examples=10, deadline=None)
def test_basis_change_oracle_fuzz(rank, dim, dim_out, seed):
    """contract_all_indices_with_matrix vs the dense tensordot chain,
    random shapes incl. rectangular W (reference symalg.py:475-496)."""
    from symtensor_tpu import symalg

    rng = np.random.default_rng(seed)
    dense = _random_sym_dense(rank, dim, rng)
    A = st.FlatSymmetricTensor.from_dense(dense)
    W = jnp.asarray(rng.normal(size=(dim, dim_out)))
    C = symalg.contract_all_indices_with_matrix(A, W)
    oracle = dense
    for _ in range(rank):
        oracle = jnp.tensordot(oracle, W, axes=[[0], [0]])
    np.testing.assert_allclose(
        np.asarray(C.todense()), np.asarray(oracle), atol=1e-9
    )


@given(
    rank=st_.integers(1, 5),
    dim=st_.integers(1, 6),
    seed=st_.integers(0, 2**31 - 1),
)
@settings(max_examples=10, deadline=None)
def test_poly_eval_oracle_fuzz(rank, dim, seed):
    """contract_all_indices_with_vector vs repeated dense tensordot."""
    from symtensor_tpu import symalg

    rng = np.random.default_rng(seed)
    dense = _random_sym_dense(rank, dim, rng)
    A = st.FlatSymmetricTensor.from_dense(dense)
    x = jnp.asarray(rng.normal(size=dim))
    got = float(symalg.contract_all_indices_with_vector(A, x))
    oracle = dense
    for _ in range(rank):
        oracle = jnp.tensordot(oracle, x, axes=[[0], [0]])
    np.testing.assert_allclose(got, float(oracle), rtol=1e-8, atol=1e-8)


@given(
    ra=st_.integers(1, 3),
    rb=st_.integers(1, 3),
    dim=st_.integers(2, 4),
    seed=st_.integers(0, 2**31 - 1),
)
@settings(max_examples=8, deadline=None)
def test_symmetric_outer_oracle_fuzz(ra, rb, dim, seed):
    """symalg.multiply.outer vs densify → np.multiply.outer → symmetrize
    (the reference's universal oracle, testing/api.py:474)."""
    from symtensor_tpu import symalg
    from symtensor_tpu.ops.symmetrize import symmetrize

    rng = np.random.default_rng(seed)
    da = _random_sym_dense(ra, dim, rng)
    db = _random_sym_dense(rb, dim, rng)
    A = st.FlatSymmetricTensor.from_dense(da)
    B = st.FlatSymmetricTensor.from_dense(db)
    C = symalg.multiply.outer(A, B)
    oracle = symmetrize(jnp.tensordot(da, db, axes=0))
    np.testing.assert_allclose(
        np.asarray(C.todense()), np.asarray(oracle), atol=1e-10
    )


@given(dim=st_.integers(1, 20), seed=st_.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_power_sum_monomial_identity(dim, seed):
    """m_(1,1)(x)·2 + m_(2)(x) = p1² (Newton's identity, fuzzed)."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=dim))
    from symtensor_tpu import symalg

    m11 = float(symalg.monomial_symmetric((1, 1), x)) if dim >= 2 else 0.0
    m2 = float(symalg.monomial_symmetric((2,), x))
    p1 = float(x.sum())
    np.testing.assert_allclose(2 * m11 + m2, p1**2, rtol=1e-9, atol=1e-9)
