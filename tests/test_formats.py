"""Generic format-parameterized API battery, modeled on the reference's
SymTensorAPI (symtensor/testing/api.py:56): one suite, bound per format.
Oracle: dense arrays + `symmetrize`.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import symtensor_tpu as st
from symtensor_tpu.ops.symmetrize import is_symmetric, symmetrize
from symtensor_tpu.utils import combinatorics as comb

FORMATS = [
    st.DenseSymmetricTensor,
    st.FlatSymmetricTensor,
    st.PermClsSymmetricTensor,
]
RD = [(2, 3), (3, 4), (4, 3), (5, 2), (1, 5), (6, 3)]


def random_sym(rank, dim, rng, dtype=np.float64):
    a = rng.normal(size=(dim,) * rank).astype(dtype)
    return np.asarray(symmetrize(a))


@pytest.fixture(params=FORMATS, ids=lambda c: c.format)
def fmt(request):
    return request.param


# ------------------------------------------------------------- creation


@pytest.mark.parametrize("rank,dim", RD)
def test_creation_roundtrip(fmt, rank, dim, rng):
    dense = random_sym(rank, dim, rng)
    A = fmt.from_dense(dense)
    assert A.rank == rank and A.dim == dim
    assert A.shape == (dim,) * rank
    assert A.indep_size == comb.indep_size(rank, dim)
    np.testing.assert_allclose(np.asarray(A.todense()), dense, atol=1e-12)


def test_creation_zeros_and_dtype(fmt):
    A = fmt.zeros(3, 4, dtype=jnp.float32)
    assert A.dtype == jnp.float32
    assert np.all(np.asarray(A.todense()) == 0)
    B = A.astype(jnp.float64)
    assert B.dtype == jnp.float64


def test_creation_rejects_nonsymmetric(fmt):
    bad = np.arange(9.0).reshape(3, 3)
    with pytest.raises(ValueError):
        fmt.from_dense(bad)
    # symmetrize=True projects instead
    A = fmt.from_dense(bad, symmetrize=True)
    np.testing.assert_allclose(
        np.asarray(A.todense()), (bad + bad.T) / 2, atol=1e-12
    )


def test_perm_classes_labels(fmt):
    A = fmt.zeros(3, 4)
    assert A.perm_classes == ("iii", "iij", "ijk")


# ------------------------------------------------------------- indexing


@pytest.mark.parametrize("rank,dim", [(2, 3), (3, 4), (4, 3)])
def test_element_access(fmt, rank, dim, rng):
    dense = random_sym(rank, dim, rng)
    A = fmt.from_dense(dense)
    for idx in itertools.product(range(dim), repeat=rank):
        np.testing.assert_allclose(
            float(A[idx]), dense[idx], atol=1e-12, err_msg=str(idx)
        )


def test_class_values_match_dense(fmt, rng):
    rank, dim = 3, 4
    dense = random_sym(rank, dim, rng)
    A = fmt.from_dense(dense)
    for label in A.perm_classes:
        vals = np.asarray(A[label])
        reps = list(A.permcls_indep_iter_repindex(label))
        assert vals.shape == (len(reps),)
        for v, rep in zip(vals, reps):
            np.testing.assert_allclose(v, dense[rep], atol=1e-12)


def test_partial_indexing(fmt, rng):
    rank, dim = 4, 3
    dense = random_sym(rank, dim, rng)
    A = fmt.from_dense(dense)
    B = A[1]
    assert isinstance(B, st.SymmetricTensor)
    assert B.rank == 3 and B.dim == dim
    np.testing.assert_allclose(np.asarray(B.todense()), dense[1], atol=1e-12)
    C = A[2, 0]
    assert C.rank == 2
    np.testing.assert_allclose(np.asarray(C.todense()), dense[2, 0], atol=1e-12)
    # trailing slices tolerated
    D = A[1, :, :, :]
    np.testing.assert_allclose(np.asarray(D.todense()), dense[1], atol=1e-12)


def test_elementwise_assignment_updates_class(fmt):
    """Golden-array test (reference testing/api.py:285-301): assigning one
    index updates every permutation in the dense render."""
    A = fmt.zeros(3, 3)
    A = A.at[0, 1, 2].set(5.0)
    d = np.asarray(A.todense())
    for p in itertools.permutations((0, 1, 2)):
        assert d[p] == 5.0
    assert d.sum() == 30.0  # exactly the 6 permutations
    A = A.at[1, 1, 1].set(2.0)
    d = np.asarray(A.todense())
    assert d[1, 1, 1] == 2.0
    assert d.sum() == 32.0


def test_class_assignment(fmt):
    A = fmt.zeros(3, 3)
    n_iij = comb.class_size((2, 1), 3)
    vals = np.arange(1.0, n_iij + 1)
    A = A.at["iij"].set(vals)
    np.testing.assert_allclose(np.asarray(A["iij"]), vals, atol=1e-15)
    # other classes untouched
    assert np.all(np.asarray(A["iii"]) == 0)
    assert np.all(np.asarray(A["ijk"]) == 0)
    # dense render consistent: A[0,0,1] is some value from vals
    d = np.asarray(A.todense())
    assert d[0, 0, 1] in vals
    assert d[0, 0, 1] == d[0, 1, 0] == d[1, 0, 0]
    # scalar broadcast into a class
    B = A.at["iii"].set(7.0)
    assert np.all(np.asarray(B["iii"]) == 7.0)


def test_at_add(fmt):
    A = fmt.zeros(2, 3)
    A = A.at[0, 1].set(1.0).at[0, 1].add(2.0)
    assert float(A[0, 1]) == 3.0
    assert float(A[1, 0]) == 3.0


def test_transpose_noop(fmt, rng):
    dense = random_sym(3, 3, rng)
    A = fmt.from_dense(dense)
    assert A.transpose() is A
    assert A.T is A


# ------------------------------------------------------------ iterators


def test_iterator_counts(fmt, rng):
    rank, dim = 3, 4
    A = fmt.from_dense(random_sym(rank, dim, rng))
    n = comb.indep_size(rank, dim)
    assert len(list(A.indep_iter())) == n
    assert len(list(A.indep_iter_repindex())) == n
    assert len(list(A.flat)) == dim**rank
    # multiplicities sum to dense size
    assert sum(A.permcls_multiplicity_iter()) == dim**rank
    # per-class iteration covers everything once
    total = sum(
        len(list(A.permcls_indep_iter(c))) for c in A.perm_classes
    )
    assert total == n


def test_indep_iter_values_match(fmt, rng):
    dense = random_sym(2, 4, rng)
    A = fmt.from_dense(dense)
    for v, rep in zip(A.indep_iter(), A.indep_iter_repindex()):
        np.testing.assert_allclose(v, dense[rep], atol=1e-12)


# ----------------------------------------------------------- arithmetic


def test_arithmetic(fmt, rng):
    rank, dim = 3, 3
    da = random_sym(rank, dim, rng)
    db = random_sym(rank, dim, rng)
    A, B = fmt.from_dense(da), fmt.from_dense(db)
    np.testing.assert_allclose(np.asarray((A + B).todense()), da + db, atol=1e-12)
    np.testing.assert_allclose(np.asarray((A - B).todense()), da - db, atol=1e-12)
    np.testing.assert_allclose(np.asarray((A * B).todense()), da * db, atol=1e-12)
    np.testing.assert_allclose(np.asarray((A * 2.5).todense()), da * 2.5, atol=1e-12)
    np.testing.assert_allclose(np.asarray((1.0 + A).todense()), 1.0 + da, atol=1e-12)
    np.testing.assert_allclose(np.asarray((-A).todense()), -da, atol=1e-12)
    np.testing.assert_allclose(np.asarray(abs(A).todense()), abs(da), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray((A / (B * B + 1.0)).todense()), da / (db * db + 1), atol=1e-12
    )
    # exp/log style unary through ops
    E = st.ops.elementwise.unary(jnp.exp, A)
    np.testing.assert_allclose(np.asarray(E.todense()), np.exp(da), atol=1e-12)


def test_arithmetic_mixed_formats(rng):
    da = random_sym(3, 3, rng)
    db = random_sym(3, 3, rng)
    A = st.DenseSymmetricTensor.from_dense(da)
    B = st.FlatSymmetricTensor.from_dense(db)
    C = st.PermClsSymmetricTensor.from_dense(db)
    out = A + B
    assert out.format == "flat"
    np.testing.assert_allclose(np.asarray(out.todense()), da + db, atol=1e-12)
    out2 = A * C
    assert out2.format == "permcls"
    np.testing.assert_allclose(np.asarray(out2.todense()), da * db, atol=1e-12)
    out3 = B - C
    assert out3.format == "flat"
    np.testing.assert_allclose(np.asarray(out3.todense()), db - db, atol=1e-12)


def test_comparisons(fmt, rng):
    da = random_sym(2, 4, rng)
    A = fmt.from_dense(da)
    B = fmt.from_dense(da.copy())
    assert A.allclose(B)
    assert A.array_equal(B)
    assert not A.allclose(B + 1.0)
    assert not A.array_equal(B + 1.0)


def test_shape_mismatch_raises(fmt):
    A = fmt.zeros(2, 3)
    B = fmt.zeros(3, 3)
    with pytest.raises(ValueError):
        A + B
    with pytest.raises(TypeError):
        A + np.ones((3, 3))  # array operands must be wrapped


# ----------------------------------------------------- jax transformations


def test_jit_vmap_grad(fmt, rng):
    dense = random_sym(2, 4, rng)
    A = fmt.from_dense(dense)

    @jax.jit
    def f(t):
        return (t * t).toflat().data.sum()

    expected = (
        np.asarray(A.toflat().data) ** 2
    ).sum()
    np.testing.assert_allclose(float(f(A)), expected, rtol=1e-12)

    # grad through the pytree
    g = jax.grad(f)(A)
    assert isinstance(g, fmt)
    np.testing.assert_allclose(
        np.asarray(g.toflat().data),
        2 * np.asarray(A.toflat().data),
        rtol=1e-12,
    )

    # vmap over a stacked pytree
    stacked = jax.tree.map(
        lambda x: jnp.stack([x, 2 * x]), A
    )
    out = jax.vmap(f)(stacked)
    np.testing.assert_allclose(
        np.asarray(out), [expected, 4 * expected], rtol=1e-12
    )


def test_traced_element_access(fmt, rng):
    dense = random_sym(3, 4, rng)
    A = fmt.from_dense(dense)

    @jax.jit
    def get(t, i, j, k):
        return t.element((i, j, k))

    assert float(get(A, 2, 0, 3)) == pytest.approx(dense[2, 0, 3], abs=1e-12)


# ------------------------------------------------------------- permcls


def test_permcls_scalar_compression():
    A = st.PermClsSymmetricTensor(rank=3, dim=5, data={"iii": 2.0, "iij": 1.0})
    assert set(A.scalar_classes) == {"iii", "iij", "ijk"}
    assert A.memory_footprint() < 100  # three 0-d leaves
    d = np.asarray(A.todense())
    assert d[1, 1, 1] == 2.0
    assert d[0, 0, 1] == 1.0
    assert d[0, 1, 2] == 0.0
    # expand makes shapes static-full
    B = A.expand()
    assert B.scalar_classes == ()
    assert B.allclose(A)
    # write to a scalar class expands it
    C = A.at[0, 0, 1].set(9.0)
    assert "iij" not in C.scalar_classes
    assert float(C[0, 0, 1]) == 9.0
    assert float(C[0, 0, 2]) == 1.0


def test_permcls_dict_vector_init():
    n = comb.class_size((2, 1), 4)
    A = st.PermClsSymmetricTensor(
        rank=3, dim=4, data={"iij": np.arange(1.0, n + 1)}
    )
    assert np.asarray(A["iij"]).shape == (n,)
    with pytest.raises(ValueError):
        st.PermClsSymmetricTensor(rank=3, dim=4, data={"iij": np.ones(5)})
    with pytest.raises(ValueError):
        st.PermClsSymmetricTensor(rank=3, dim=4, data={"iijj": 1.0})


def test_permcls_empty_class_excluded():
    # dim 2 cannot host 'ijk'
    A = st.PermClsSymmetricTensor(rank=3, dim=2)
    assert (1, 1, 1) not in A.data
    with pytest.raises(KeyError):
        A["ijk"]


# ------------------------------------------------------------- misc


def test_rank0_and_rank1(fmt):
    v = np.array([1.0, 2.0, 3.0])
    A = fmt.from_dense(v)
    assert A.rank == 1 and A.dim == 3
    np.testing.assert_allclose(np.asarray(A.todense()), v)
    assert float(A[1]) == 2.0
    s = fmt.from_dense(np.array(4.0))
    assert s.rank == 0
    np.testing.assert_allclose(float(s.todense()), 4.0)


def test_array_interop_warns(fmt, rng):
    A = fmt.from_dense(random_sym(2, 3, rng))
    with pytest.warns(UserWarning, match="densifying"):
        arr = np.asarray(A)
    assert arr.shape == (3, 3)


def test_memory_footprint(rng):
    dense = random_sym(4, 6, rng)
    F = st.FlatSymmetricTensor.from_dense(dense)
    D = st.DenseSymmetricTensor.from_dense(dense)
    assert F.memory_footprint() < D.memory_footprint()
    assert F.memory_footprint() == comb.indep_size(4, 6) * 8


def test_copy_identity(fmt, rng):
    A = fmt.from_dense(random_sym(2, 3, rng))
    assert A.copy() is A  # immutable: copy is the identity


def test_illegal_initializations(fmt):
    with pytest.raises(ValueError):
        fmt.zeros(2, 3).__class__(rank=None, dim=None)
    if fmt is st.FlatSymmetricTensor:
        with pytest.raises(ValueError):
            fmt(rank=2, dim=3, data=np.ones(5))  # wrong packed length
    if fmt is st.DenseSymmetricTensor:
        with pytest.raises(ValueError):
            fmt(rank=3, dim=3, data=np.zeros((3, 3)))  # rank mismatch
        with pytest.raises(ValueError):
            fmt(data=np.zeros((3, 4)))  # not hypercubic


def test_numpy_interop_outer_densifies_with_warning(fmt, rng):
    """Design delta vs reference (testing/api.py:481: raises): plain NumPy
    ufuncs densify with a warning and return dense ndarrays."""
    da = random_sym(2, 3, rng)
    A = fmt.from_dense(da)
    with pytest.warns(UserWarning, match="densifying"):
        out = np.multiply.outer(np.asarray(A), np.asarray(A))
    assert out.shape == (3, 3, 3, 3)
    np.testing.assert_allclose(out, np.multiply.outer(da, da), atol=1e-12)


def test_np_tensordot_blocked(fmt, rng):
    """np.tensordot is not symmetrized — blocked with an instructive error
    (reference symalg.py:341-347); np.allclose runs natively on compressed
    storage (no densify warning — reference base.py:1623), while
    unhandled np functions still densify-fallback with a warning."""
    A = fmt.from_dense(random_sym(3, 4, rng))
    with pytest.raises(TypeError, match="symalg.tensordot"):
        np.tensordot(A, A, axes=1)
    from symtensor_tpu.testing.utils import does_not_warn

    with does_not_warn(match="densifying"):
        assert np.allclose(A, A)
    with pytest.warns(UserWarning, match="densifying"):
        assert np.sum(A) == pytest.approx(float(np.sum(A.todense())))


def test_data_alignment(fmt):
    A = fmt.zeros(2, 3)
    assert A.data_alignment == fmt.format


def test_permcls_compress():
    A = st.PermClsSymmetricTensor(rank=3, dim=4, data={"iii": 2.0}).expand()
    assert A.scalar_classes == ()
    B = A.compress()
    assert set(B.scalar_classes) == {"iii", "iij", "ijk"}
    assert B.allclose(A)
    # non-constant class stays expanded
    C = A.at[0, 0, 1].set(9.0).compress()
    assert "iij" not in C.scalar_classes
    assert "iii" in C.scalar_classes
