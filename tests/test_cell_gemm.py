"""Cell-major prefix-GEMM batched evaluation (kernels/cell_gemm.py).

Oracle: the grouped batched path (itself tested against dense einsum in
test_poly_eval.py), plus an explicit dense-einsum check at small size.
Reference op semantics: contract_all_indices_with_vector
(/root/reference/symtensor/symalg.py:505-527).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import symtensor_tpu as st
from symtensor_tpu import symalg
from symtensor_tpu.kernels.cell_gemm import (
    _cell_blocks_static,
    cell_eligible,
    cell_views,
    poly_eval_cell_batched,
)
from symtensor_tpu.kernels.poly_eval import poly_eval_flat_batched


@pytest.mark.parametrize(
    "rank,dim",
    [(3, 2), (3, 4), (3, 9), (4, 1), (4, 6), (4, 11), (5, 5), (6, 6)],
)
def test_matches_grouped_path(rng, rank, dim):
    n = st.utils.indep_size(rank, dim)
    A = st.FlatSymmetricTensor(
        rank=rank, dim=dim, data=jnp.asarray(rng.normal(size=n))
    )
    xs = jnp.asarray(rng.normal(size=(7, dim)))
    assert cell_eligible(rank, dim)
    got = np.asarray(poly_eval_cell_batched(A, xs))
    ref = np.asarray(poly_eval_flat_batched(A, xs))
    np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-11)


def test_matches_dense_einsum_oracle(rng):
    rank, dim = 4, 5
    from symtensor_tpu.ops.symmetrize import symmetrize

    dense = np.asarray(symmetrize(rng.normal(size=(dim,) * rank)))
    A = st.FlatSymmetricTensor.from_dense(jnp.asarray(dense))
    xs = rng.normal(size=(3, dim))
    ref = np.einsum("ijkl,bi,bj,bk,bl->b", dense, xs, xs, xs, xs)
    got = np.asarray(poly_eval_cell_batched(A, jnp.asarray(xs)))
    np.testing.assert_allclose(got, ref, rtol=1e-11)


def test_block_structure_invariants():
    rank, dim = 4, 20
    blocks = _cell_blocks_static(rank, dim)
    # prefixes are nondecreasing; cells exactly tile the (t1 <= t2) wedge
    Ks = [b[0] for b in blocks]
    assert Ks == sorted(Ks)
    cells = set()
    for K, t1s, t2s, idx, scale in blocks:
        assert idx.shape == scale.shape == (K * len(t1s),)
        assert (t1s <= t2s).all()
        for t1, t2 in zip(t1s.tolist(), t2s.tolist()):
            cells.add((t1, t2))
        # every packed position referenced is in range
        assert idx.min() >= 0 and idx.max() < st.utils.indep_size(rank, dim)
    assert len(cells) == dim * (dim + 1) // 2
    # nonzero scales count exactly the independent components
    nz = sum(int((b[4] != 0).sum()) for b in blocks)
    assert nz == st.utils.indep_size(rank, dim)


def test_public_op_routes_and_jits(rng):
    rank, dim = 4, 7
    n = st.utils.indep_size(rank, dim)
    A = st.FlatSymmetricTensor(
        rank=rank, dim=dim, data=jnp.asarray(rng.normal(size=n))
    )
    xs = jnp.asarray(rng.normal(size=(5, dim)))
    ref = np.asarray(poly_eval_flat_batched(A, xs))
    got = np.asarray(symalg.contract_all_indices_with_vector_batched(A, xs))
    np.testing.assert_allclose(got, ref, rtol=1e-11)
    f = jax.jit(
        lambda a, x: symalg.contract_all_indices_with_vector_batched(a, x)
    )
    np.testing.assert_allclose(np.asarray(f(A, xs)), ref, rtol=1e-11)
    # tracing must not leave tracers in the instance cache
    views = getattr(A, "_cell_views", None)
    if views is not None:
        assert not any(
            isinstance(v, jax.core.Tracer) for blk in views for v in blk
        )


def test_grad_through_cell_path(rng):
    rank, dim = 4, 6
    n = st.utils.indep_size(rank, dim)
    A = st.FlatSymmetricTensor(
        rank=rank, dim=dim, data=jnp.asarray(rng.normal(size=n))
    )
    xs = jnp.asarray(rng.normal(size=(4, dim)))

    def loss(x):
        return jnp.sum(poly_eval_cell_batched(A, x))

    g = jax.grad(loss)(xs)
    eps = 1e-6
    num = (loss(xs.at[2, 3].add(eps)) - loss(xs.at[2, 3].add(-eps))) / (
        2 * eps
    )
    np.testing.assert_allclose(float(g[2, 3]), float(num), rtol=1e-7)


def test_views_cached_once(rng):
    rank, dim = 3, 6
    n = st.utils.indep_size(rank, dim)
    A = st.FlatSymmetricTensor(
        rank=rank, dim=dim, data=jnp.asarray(rng.normal(size=n))
    )
    v1 = cell_views(A)
    v2 = cell_views(A)
    assert v1 is v2


def test_batch_chunking(rng):
    # force the chunked path by a large-ish batch at a small size
    import symtensor_tpu.kernels.cell_gemm as cg

    rank, dim = 3, 5
    n = st.utils.indep_size(rank, dim)
    A = st.FlatSymmetricTensor(
        rank=rank, dim=dim, data=jnp.asarray(rng.normal(size=n))
    )
    xs = jnp.asarray(rng.normal(size=(37, dim)))
    old = cg._MAX_WEIGHT_ELEMS
    try:
        cg._MAX_WEIGHT_ELEMS = 1  # chunk = 16
        got = np.asarray(poly_eval_cell_batched(A, xs))
    finally:
        cg._MAX_WEIGHT_ELEMS = old
    ref = np.asarray(poly_eval_flat_batched(A, xs))
    np.testing.assert_allclose(got, ref, rtol=1e-11)
