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
