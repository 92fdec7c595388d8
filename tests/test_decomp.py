"""Decomp (CP) format tests — modeled on the reference's decomp battery
(symtensor/testing/decomp_tensor_test.py): indexing for all multiplicity
patterns, todense, algebra, multiplicity surgery, contractions, constructors.
Oracle: explicit weights/factors expansion + symmetrize."""

import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import symtensor_tpu as st
from symtensor_tpu import symalg
from symtensor_tpu.ops.symmetrize import symmetrize
from symtensor_tpu.utils import combinatorics as comb

D = st.DecompSymmetricTensor


def dense_oracle(weights, factors, multiplicities):
    """Explicit dense build: Σ w[a…] ⊗ f^{⊗m}…, then symmetrize."""
    w = np.asarray(weights)
    f = np.asarray(factors)
    k = len(multiplicities)
    F, d = f.shape
    rank = sum(multiplicities)
    out = np.zeros((d,) * rank)
    for a_tuple in itertools.product(range(F), repeat=k):
        term = np.array(w[a_tuple])
        block = np.ones(())
        for t, m in enumerate(multiplicities):
            for _ in range(m):
                block = np.multiply.outer(block, f[a_tuple[t]])
        out += term * block
    return np.asarray(symmetrize(out))


def make(rng, dim, multiplicities, F=3, dtype=jnp.float64):
    k = len(multiplicities)
    w = rng.normal(size=(F,) * k)
    f = rng.normal(size=(F, dim))
    t = D(
        rank=sum(multiplicities),
        dim=dim,
        weights=jnp.asarray(w),
        factors=jnp.asarray(f),
        multiplicities=multiplicities,
        dtype=dtype,
    )
    return t, dense_oracle(w, f, multiplicities)


MULTS = [(2,), (3,), (1, 1), (2, 1), (2, 2), (1, 1, 1), (3, 2), (2, 1, 1, 1)]


@pytest.mark.parametrize("mult", MULTS)
def test_todense_and_elements(mult, rng):
    dim = 3
    t, oracle = make(rng, dim, mult)
    np.testing.assert_allclose(np.asarray(t.todense()), oracle, atol=1e-10)
    # element retrieval for a handful of indices (incl. repeated patterns)
    for idx in itertools.islice(
        itertools.product(range(dim), repeat=t.rank), 0, 30, 3
    ):
        np.testing.assert_allclose(
            float(t.element(idx)), oracle[idx], atol=1e-10, err_msg=str(idx)
        )
    # class values
    for label in t.perm_classes:
        got = np.asarray(t[label])
        reps = list(t.permcls_indep_iter_repindex(label))
        for v, rep in zip(np.atleast_1d(got), reps):
            np.testing.assert_allclose(v, oracle[rep], atol=1e-10)


def test_structure_properties(rng):
    t, _ = make(rng, 4, (2, 1), F=5)
    assert t.num_factors == 5
    assert t.num_indep_factors == 2
    assert t.num_arrangements == comb.multinom(3, (2, 1)) == 3
    assert t.size == 25 + 20
    assert t.format == "decomp"


def test_split_sort_match(rng):
    t, oracle = make(rng, 3, (3, 1))
    s = t.split_factors(0)
    assert s.multiplicities == (2, 1, 1)
    np.testing.assert_allclose(np.asarray(s.todense()), oracle, atol=1e-10)
    s2 = s.match_multiplicities((1, 1, 1, 1))
    assert s2.multiplicities == (1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(s2.todense()), oracle, atol=1e-10)
    # sort
    rng2 = np.random.default_rng(7)
    u, du = make(rng2, 3, (1, 3))
    v = u.sort_multiplicities()
    assert v.multiplicities == (3, 1)
    np.testing.assert_allclose(np.asarray(v.todense()), du, atol=1e-10)
    with pytest.raises(ValueError):
        t.split_factors(1)  # multiplicity 1 cannot split
    with pytest.raises(ValueError):
        t.match_multiplicities((2, 2, 1))  # wrong total


def test_find_common_multiplicities(rng):
    a, _ = make(rng, 3, (3, 1))
    b, _ = make(rng, 3, (2, 2))
    assert a.find_common_multiplicities(b) == (2, 1, 1)
    c, _ = make(rng, 3, (4,))
    assert c.find_common_multiplicities(c) == (4,)


def test_add_and_scalar_ops(rng):
    a, da = make(rng, 3, (2, 1))
    b, db = make(rng, 3, (3,))
    out = a + b
    assert out.format == "decomp"
    np.testing.assert_allclose(np.asarray(out.todense()), da + db, atol=1e-10)
    out = a - b
    np.testing.assert_allclose(np.asarray(out.todense()), da - db, atol=1e-10)
    out = a * 2.5
    assert out.format == "decomp"
    np.testing.assert_allclose(np.asarray(out.todense()), 2.5 * da, atol=1e-10)
    out = 0.5 + a
    assert out.format == "decomp"
    np.testing.assert_allclose(np.asarray(out.todense()), da + 0.5, atol=1e-10)
    out = a / 4.0
    np.testing.assert_allclose(np.asarray(out.todense()), da / 4, atol=1e-10)
    out = -a
    np.testing.assert_allclose(np.asarray(out.todense()), -da, atol=1e-10)
    # elementwise multiply falls back to packed format
    out = a * b
    assert out.format == "flat"
    np.testing.assert_allclose(np.asarray(out.todense()), da * db, atol=1e-10)


def test_outer_decomp(rng):
    a, da = make(rng, 3, (2,), F=2)
    b, db = make(rng, 3, (1, 1), F=2)
    out = symalg.multiply.outer(a, b)
    assert out.format == "decomp"
    assert out.multiplicities == (2, 1, 1)
    oracle = np.asarray(symmetrize(np.multiply.outer(da, db)))
    np.testing.assert_allclose(np.asarray(out.todense()), oracle, atol=1e-10)


@pytest.mark.parametrize("ra,rb,k", [(2, 2, 1), (2, 2, 2), (3, 2, 1), (3, 2, 2), (2, 1, 1)])
def test_tensordot_single_group(ra, rb, k, rng):
    a, da = make(rng, 3, (ra,), F=2)
    b, db = make(rng, 3, (rb,), F=2)
    out = symalg.tensordot(a, b, axes=k)
    oracle = np.asarray(symmetrize(np.tensordot(da, db, axes=k)))
    if ra + rb - 2 * k == 0:
        np.testing.assert_allclose(float(out.todense()), oracle, atol=1e-10)
    else:
        assert out.format == "decomp"
        np.testing.assert_allclose(
            np.asarray(out.todense()), oracle, atol=1e-10
        )


@pytest.mark.parametrize("ma,mb", [((2, 1), (2,)), ((1, 1), (2, 1)), ((2, 2), (1, 1))])
def test_tensordot_axes1_multi_group(ma, mb, rng):
    a, da = make(rng, 3, ma, F=2)
    b, db = make(rng, 3, mb, F=2)
    out = symalg.tensordot(a, b, axes=1)
    assert out.format == "decomp"
    oracle = np.asarray(symmetrize(np.tensordot(da, db, axes=1)))
    np.testing.assert_allclose(np.asarray(out.todense()), oracle, atol=1e-10)


@pytest.mark.parametrize(
    "ma,mb,k",
    [
        ((2, 1), (2, 1), 2),
        ((2, 1), (3,), 2),
        ((2, 2), (2, 1), 3),
        ((1, 1, 1), (2, 1), 2),
        ((2, 1), (2, 1), 3),  # scalar result
        ((2, 2), (1, 1, 1, 1), 4),  # scalar result, deep tables
    ],
)
def test_tensordot_axesk_multi_group(ma, mb, k, rng):
    """General multi-group axes≥2 — stays in decomp format (the reference
    requires single-group operands here, decomp_symmtensor.py:1419-1423)."""
    a, da = make(rng, 3, ma, F=2)
    b, db = make(rng, 3, mb, F=2)
    out = symalg.tensordot(a, b, axes=k)
    oracle = np.asarray(symmetrize(np.tensordot(da, db, axes=k)))
    if sum(ma) + sum(mb) - 2 * k == 0:
        np.testing.assert_allclose(float(out.todense()), oracle, atol=1e-9)
    else:
        assert out.format == "decomp"
        np.testing.assert_allclose(
            np.asarray(out.todense()), oracle, atol=1e-9
        )


@pytest.mark.parametrize("mult", [(3,), (2, 1), (1, 1, 1), (4,), (2, 2),
                                  (3, 1), (2, 1, 1), (3, 2)])
def test_reduce_factors_high_rank(mult, rng):
    """Rank-agnostic reduce_factors (reference hand-writes ranks 3-4 only,
    decomp_symmtensor.py:929-968, and caps there)."""
    dim = 3
    t, da = make(rng, dim, mult, F=5)  # num_factors > dim triggers reduce
    red = t.reduce_factors()
    assert red.num_factors == dim
    assert red.multiplicities == (1,) * sum(mult)
    np.testing.assert_allclose(np.asarray(red.todense()), da, atol=1e-9)
    # below the gate: returned unchanged
    t2, _ = make(rng, dim, mult, F=2)
    assert t2.reduce_factors() is t2


def test_reduce_factors_rank1(rng):
    v1 = rng.normal(size=4)
    v2 = rng.normal(size=4)
    t = D.from_vector(jnp.asarray(v1), 1).add_decomp(
        D.from_vector(jnp.asarray(v2), 1)
    )
    red = t.reduce_factors()
    assert red.num_factors == 1
    np.testing.assert_allclose(np.asarray(red.todense()), v1 + v2, atol=1e-12)


def test_contractions(rng):
    a, da = make(rng, 4, (2, 1), F=3)
    W = rng.normal(size=(4, 5))
    out = symalg.contract_all_indices_with_matrix(a, W)
    assert out.format == "decomp" and out.dim == 5
    spec = "abc,ai,bj,ck->ijk"
    oracle = np.einsum(spec, da, W, W, W)
    np.testing.assert_allclose(np.asarray(out.todense()), oracle, atol=1e-9)

    x = rng.normal(size=4)
    got = float(symalg.contract_all_indices_with_vector(a, x))
    expect = np.einsum("abc,a,b,c->", da, x, x, x)
    np.testing.assert_allclose(got, expect, rtol=1e-10)


def test_from_vector_from_matrix_reduce(rng):
    v = rng.normal(size=5)
    t = D.from_vector(jnp.asarray(v), 3)
    oracle = np.multiply.outer(np.multiply.outer(v, v), v)
    np.testing.assert_allclose(np.asarray(t.todense()), oracle, atol=1e-12)

    m = rng.normal(size=(5, 5))
    m = m + m.T
    t2 = D.from_matrix(jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(t2.todense()), m, atol=1e-10)

    # reduce_factors: blow up the factor count by adding, then re-compress
    big = t2.add_decomp(t2.scale(-0.5))
    assert big.num_factors == 10
    red = big.reduce_factors()
    assert red.num_factors <= 5
    np.testing.assert_allclose(
        np.asarray(red.todense()), 0.5 * m, atol=1e-9
    )


def test_setitem_forbidden(rng):
    t, _ = make(rng, 3, (2,))
    with pytest.raises(TypeError):
        t.at["ii"].set(1.0)
    with pytest.raises(TypeError):
        t.at[0, 1].set(1.0)


def test_decomp_jit_grad(rng):
    t, da = make(rng, 4, (2, 1), F=2, dtype=jnp.float64)
    x = jnp.asarray(rng.normal(size=4))

    f = jax.jit(lambda t, x: symalg.contract_all_indices_with_vector(t, x))
    np.testing.assert_allclose(
        float(f(t, x)), np.einsum("abc,a,b,c->", da, x, x, x), rtol=1e-10
    )
    g = jax.grad(lambda t, x: f(t, x), argnums=0)(t, x)
    assert isinstance(g, D)
    assert g.weights.shape == t.weights.shape


def test_contract_tensor_list_moment_hierarchy(rng):
    """BASELINE config 4 (scaled down): contract a decomp tensor against a
    5-tensor list of rank-2 moments."""
    dim = 5
    a, da = make(rng, dim, (2,), F=2)
    chis, chid = [], []
    for _ in range(dim):
        m = rng.normal(size=(dim, dim))
        m = (m + m.T) / 2
        chid.append(m)
        chis.append(D.from_matrix(jnp.asarray(m)))
    out = symalg.contract_tensor_list(a, chis, n_times=1)
    # oracle
    r, mr = 2, 2
    acc = np.zeros((dim,) * (r - 1 + mr))
    for i in range(dim):
        acc += np.multiply.outer(da[i], chid[i])
    oracle = np.asarray(symmetrize(acc))
    np.testing.assert_allclose(np.asarray(out.todense()), oracle, atol=1e-9)


def test_decomp_mixed_format_interop(rng):
    t, da = make(rng, 3, (2,), F=2)
    F = st.FlatSymmetricTensor.from_dense(jnp.asarray(da))
    out = t + F
    assert out.format == "flat"
    np.testing.assert_allclose(np.asarray(out.todense()), 2 * da, atol=1e-9)
    out2 = symalg.tensordot(t, F, axes=1)
    oracle = np.asarray(symmetrize(np.tensordot(da, da, axes=1)))
    np.testing.assert_allclose(np.asarray(out2.todense()), oracle, atol=1e-9)


def test_rank0_decomp_add(rng):
    a = st.DecompSymmetricTensor(
        rank=0, dim=3, weights=jnp.asarray(2.0), factors=jnp.zeros((1, 3)),
        multiplicities=(), dtype=jnp.float64,
    )
    b = st.DecompSymmetricTensor(
        rank=0, dim=3, weights=jnp.asarray(5.0), factors=jnp.zeros((1, 3)),
        multiplicities=(), dtype=jnp.float64,
    )
    assert float(a.add_decomp(b).todense()) == 7.0
    assert float((a - b).todense()) == -3.0
