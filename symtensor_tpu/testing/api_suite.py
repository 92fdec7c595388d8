"""Reusable format-generic API battery.

The reference ships a single test battery that format/backend authors bind
to their class with a fixture, overriding only the handful of
format-specific tests (symtensor/testing/api.py:56, README.md:70-74). This
is the same capability for symtensor-tpu: subclass `SymTensorSuite`, set
`tensor_cls`, get ~20 API-contract tests. See tests/test_api_suite.py for
the in-repo bindings.

The class name avoids the Test* prefix so pytest only collects bound
subclasses (same trick as the reference, tests/test_permcls_numpy.py:39).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.symmetrize import symmetrize
from ..utils import combinatorics as comb
from .utils import random_symmetric


class SymTensorSuite:
    """Generic API contract. Subclass and set `tensor_cls` (and optionally
    `ranks_dims`, `atol`)."""

    tensor_cls = None  # must be set by subclasses
    ranks_dims = ((2, 3), (3, 4), (4, 3))
    atol = 1e-9

    # ------------------------------------------------------------ helpers

    def make(self, rank, dim, rng):
        dense = random_symmetric(rank, dim, rng)
        return self.tensor_cls.from_dense(jnp.asarray(dense)), dense

    def _rng(self):
        return np.random.default_rng(1234)

    # -------------------------------------------------------------- tests

    def test_perm_classes(self):
        rank, dim = self.ranks_dims[0]
        t, _ = self.make(rank, dim, self._rng())
        assert t.perm_classes == tuple(
            comb.class_label(c) for c in comb.perm_classes(rank)
        )
        assert t.indep_size == comb.indep_size(rank, dim)
        assert t.dense_size == dim**rank

    def test_roundtrip(self):
        rng = self._rng()
        for rank, dim in self.ranks_dims:
            t, dense = self.make(rank, dim, rng)
            np.testing.assert_allclose(
                np.asarray(t.todense()), dense, atol=self.atol
            )

    def test_element_access(self):
        rng = self._rng()
        rank, dim = self.ranks_dims[0]
        t, dense = self.make(rank, dim, rng)
        for idx in itertools.product(range(dim), repeat=rank):
            np.testing.assert_allclose(
                float(t[idx]), dense[idx], atol=self.atol
            )

    def test_class_values(self):
        rng = self._rng()
        rank, dim = self.ranks_dims[0]
        t, dense = self.make(rank, dim, rng)
        for label in t.perm_classes:
            vals = np.atleast_1d(np.asarray(t[label]))
            reps = list(t.permcls_indep_iter_repindex(label))
            assert len(vals) == len(reps)
            for v, rep in zip(vals, reps):
                np.testing.assert_allclose(v, dense[rep], atol=self.atol)

    def test_iterator_counts(self):
        rng = self._rng()
        rank, dim = self.ranks_dims[0]
        t, _ = self.make(rank, dim, rng)
        n = comb.indep_size(rank, dim)
        assert len(list(t.indep_iter())) == n
        assert sum(t.permcls_multiplicity_iter()) == dim**rank

    def test_transpose_noop(self):
        rng = self._rng()
        t, _ = self.make(*self.ranks_dims[0], rng)
        assert t.transpose() is t

    def test_arithmetic(self):
        rng = self._rng()
        rank, dim = self.ranks_dims[0]
        a, da = self.make(rank, dim, rng)
        b, db = self.make(rank, dim, rng)
        np.testing.assert_allclose(
            np.asarray((a + b).todense()), da + db, atol=self.atol
        )
        np.testing.assert_allclose(
            np.asarray((a * 2.0).todense()), 2 * da, atol=self.atol
        )

    def test_comparisons(self):
        rng = self._rng()
        a, _ = self.make(*self.ranks_dims[0], rng)
        assert a.allclose(a)
        assert not a.allclose(a + 1.0)

    def test_outer(self):
        from .. import ops as symalg

        rng = self._rng()
        a, da = self.make(2, 3, rng)
        b, db = self.make(1, 3, rng)
        out = symalg.multiply.outer(a, b)
        oracle = np.asarray(symmetrize(np.multiply.outer(da, db)))
        np.testing.assert_allclose(
            np.asarray(out.todense()), oracle, atol=self.atol * 10
        )

    def test_tensordot(self):
        from .. import ops as symalg

        rng = self._rng()
        a, da = self.make(2, 3, rng)
        b, db = self.make(2, 3, rng)
        out = symalg.tensordot(a, b, axes=1)
        oracle = np.asarray(symmetrize(np.tensordot(da, db, axes=1)))
        np.testing.assert_allclose(
            np.asarray(out.todense()), oracle, atol=self.atol * 10
        )

    def test_contractions(self):
        from .. import ops as symalg

        rng = self._rng()
        rank, dim = self.ranks_dims[0]
        a, da = self.make(rank, dim, rng)
        x = rng.normal(size=dim)
        got = float(symalg.contract_all_indices_with_vector(a, x))
        expect = da
        for _ in range(rank):
            expect = expect @ x
        np.testing.assert_allclose(got, float(expect), rtol=1e-7)

    def test_serialization(self):
        from .. import serialization as ser

        rng = self._rng()
        a, _ = self.make(*self.ranks_dims[0], rng)
        b = ser.from_json(ser.to_json(a))
        assert type(b) is type(a)
        assert a.allclose(b)

    def test_jit(self):
        rng = self._rng()
        a, _ = self.make(*self.ranks_dims[0], rng)

        @jax.jit
        def f(t):
            return (t + t).toflat().data.sum()

        np.testing.assert_allclose(
            float(f(a)), 2 * float(a.toflat().data.sum()), rtol=1e-6
        )
