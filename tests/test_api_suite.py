"""Bind the exported generic battery to each format — the downstream-author
workflow the reference documents (README.md:70-74)."""

import jax.numpy as jnp
import numpy as np
import pytest

import symtensor_tpu as st
from symtensor_tpu.testing import SymTensorSuite, does_not_warn, random_symmetric


class TestDenseSuite(SymTensorSuite):
    tensor_cls = st.DenseSymmetricTensor


class TestFlatSuite(SymTensorSuite):
    tensor_cls = st.FlatSymmetricTensor


class TestPermClsSuite(SymTensorSuite):
    tensor_cls = st.PermClsSymmetricTensor


class TestDecompSuite(SymTensorSuite):
    """Decomp binds the FULL battery: `from_dense` is exact at any rank
    (eigh at rank 2, standard-basis decomposition at rank ≥ 3), so the
    only legitimately skipped tests are the functional-update ones — the
    format is read-only here as in the reference (decomp_symmtensor.py:793).
    Decomp-native capabilities (factor surgery, O(1) basis change, Gram
    tensordot) are additionally covered in tests/test_decomp.py."""

    tensor_cls = st.DecompSymmetricTensor

    @pytest.mark.slow  # decomp tensordot compiles pairing-table programs
    def test_tensordot_sweep(self):  # ~2 min; CI runs it (-m "")
        super().test_tensordot_sweep()
    ranks_dims = ((2, 3), (3, 4), (4, 3))
    atol = 1e-8
    supports_updates = False  # reference forbids decomp __setitem__ too

    def test_negative_indices(self):
        import pytest as _pytest

        t = st.DecompSymmetricTensor.from_vector(jnp.arange(1.0, 4.0), 2)
        d = np.asarray(t.todense())
        np.testing.assert_allclose(float(t[-1, 0]), d[2, 0], atol=1e-8)
        with _pytest.raises(IndexError):
            t[3, 0]

    def test_serialization(self):
        import symtensor_tpu.serialization as ser

        t = st.DecompSymmetricTensor.from_vector(jnp.arange(3.0), 2)
        b = ser.from_json(ser.to_json(t))
        assert t.toflat().allclose(b.toflat())


class TestSparseFlatSuite(SymTensorSuite):
    """The experimental BCOO-backed format passes the same battery through
    a from_dense/zeros facade; functional updates materialize to flat (the
    battery checks values, not returned storage class)."""

    class _SparseFacade:
        @staticmethod
        def from_dense(arr, **kw):
            return st.SparseFlatSymmetricTensor.from_flat(
                st.FlatSymmetricTensor.from_dense(arr, **kw)
            )

        @staticmethod
        def zeros(rank, dim, dtype=None):
            return st.SparseFlatSymmetricTensor.from_flat(
                st.FlatSymmetricTensor.zeros(rank, dim, dtype=dtype)
            )

    tensor_cls = _SparseFacade
    atol = 1e-8

    def test_illegal_initializations(self):
        with pytest.raises((TypeError, ValueError)):
            self.tensor_cls(rank=2)
        bad = np.arange(9.0).reshape(3, 3)
        with pytest.raises((ValueError, NotImplementedError)):
            self.tensor_cls.from_dense(jnp.asarray(bad))

    def test_jit(self):
        # sparse leaves jit fine but the generic body densifies storage;
        # the sparse jit story is covered in tests/test_views_sparse.py
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            super().test_jit()


def test_does_not_warn_helper():
    with does_not_warn():
        pass
    try:
        with does_not_warn(UserWarning):
            import warnings

            warnings.warn("boom")
        raised = False
    except AssertionError:
        raised = True
    assert raised


def test_random_symmetric_helper():
    a = random_symmetric(3, 4)
    from symtensor_tpu.ops.symmetrize import is_symmetric

    assert is_symmetric(a)
