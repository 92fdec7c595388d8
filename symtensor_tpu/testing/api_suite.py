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
    `ranks_dims`, `atol`, `supports_updates`)."""

    tensor_cls = None  # must be set by subclasses
    ranks_dims = ((2, 3), (3, 4), (4, 3))
    atol = 1e-9
    # Formats without functional element/class updates (e.g. decomp, whose
    # reference counterpart forbids __setitem__, decomp_symmtensor.py:793)
    # set this False to skip assignment-semantics tests.
    supports_updates = True

    # ------------------------------------------------------------ helpers

    def make(self, rank, dim, rng):
        dense = random_symmetric(rank, dim, rng)
        return self.tensor_cls.from_dense(jnp.asarray(dense)), dense

    def _rng(self):
        return np.random.default_rng(1234)

    def sweep(self, rng, max_rank=4, max_dim=3):
        """Small (rank, dim) sweep mirroring the reference's
        get_test_tensors (testing/api.py:59-67)."""
        for rank in range(1, max_rank + 1):
            for dim in range(2, max_dim + 1):
                yield self.make(rank, dim, rng)

    def _skip_if_readonly(self):
        if not self.supports_updates:
            import pytest

            pytest.skip("format does not support functional updates")

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

    def test_np_dispatch_no_densify(self):
        """np.allclose/isclose/array_equal/result_type/all/any run natively
        on compressed storage — no densify warning (reference handlers,
        base.py:1454-1684)."""
        from ..core.base import SymmetricTensor
        from .utils import does_not_warn

        rng = self._rng()
        rank, dim = self.ranks_dims[0]
        a, _ = self.make(rank, dim, rng)
        b, _ = self.make(rank, dim, rng)
        # decomp's elementwise path emits a once-per-site slow-path
        # (decomp→flat) warning — compressed, not densified; only a
        # densify warning fails this test
        with does_not_warn(match="densifying"):
            assert np.allclose(a, a)
            assert not np.allclose(a, a + 1.0)
            assert np.array_equal(a, a)
            assert not np.array_equal(a, b)
            assert np.result_type(a, np.float64) == np.float64
            close = np.isclose(a, a)
            assert np.all(close)
            far = np.isclose(a, a + 1e3)
            assert not np.any(far)
        assert isinstance(close, SymmetricTensor)

    def test_np_asarray_like_and_empty(self):
        """np.asarray(A, like=A) and np.empty(shape, like=A) stay
        compressed — native NEP-35 handlers, no densify warning
        (reference base.py:1467-1505)."""
        from ..core.base import SymmetricTensor
        from .utils import does_not_warn

        rng = self._rng()
        rank, dim = self.ranks_dims[0]
        a, _ = self.make(rank, dim, rng)
        with does_not_warn(match="densifying"):
            same = np.asarray(a, like=a)
            assert same is a
            empty = np.empty((dim,) * rank, like=a)
        assert isinstance(empty, SymmetricTensor)
        assert (empty.rank, empty.dim) == (rank, dim)
        assert not np.any(empty)
        import pytest

        with pytest.raises(ValueError):
            np.empty((dim, dim + 1), like=a)

    def test_dict_style_iteration(self):
        """keys()/values()/items() expose the storage layout; __iter__
        yields the dim rank-(r−1) sub-tensors (reference base.py:751,
        854-887)."""
        rng = self._rng()
        rank, dim = self.ranks_dims[0]
        t, dense = self.make(rank, dim, rng)
        ks = list(t.keys())
        vs = list(t.values())
        assert len(ks) == len(vs) >= 1
        assert [k for k, _ in t.items()] == ks
        subs = list(t)
        assert len(subs) == dim
        if rank >= 2:
            np.testing.assert_allclose(
                np.asarray(subs[0].todense()),
                np.asarray(dense)[0],
                atol=max(self.atol, 1e-5),
            )

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

    # ------------------------------------------------- reference battery
    # Ports of the remaining SymTensorAPI tests (reference testing/api.py).

    def test_creation_with_dtype(self):
        """reference testing/api.py:90 (design delta: JAX default dtype and
        x64-disabled semantics instead of NumPy float64)."""
        from ..core.base import default_dtype

        t = self.tensor_cls.zeros(3, 3)
        assert t.dtype == default_dtype()
        assert self.tensor_cls.zeros(3, 3, dtype=jnp.int32).dtype == jnp.int32
        assert self.tensor_cls.zeros(3, 3, dtype=bool).dtype == jnp.bool_
        assert t.astype(jnp.int32).dtype == jnp.int32

    def test_illegal_initializations(self):
        """reference testing/api.py:132."""
        import pytest

        with pytest.raises((TypeError, ValueError)):
            self.tensor_cls(rank=2)
        with pytest.raises((TypeError, ValueError)):
            self.tensor_cls(dim=2)
        # from_dense validates symmetry by default
        bad = np.arange(9.0).reshape(3, 3)
        with pytest.raises((ValueError, NotImplementedError)):
            self.tensor_cls.from_dense(jnp.asarray(bad))

    def test_elementwise_assignment_golden(self):
        """Assigning one index updates its whole index class — golden 3×3×3
        render (reference testing/api.py:285-301)."""
        self._skip_if_readonly()
        t = self.tensor_cls.zeros(3, 3)
        t = t.at[1, 2, 0].set(1.0)
        golden = np.zeros((3, 3, 3))
        for p in itertools.permutations((1, 2, 0)):
            golden[p] = 1.0
        np.testing.assert_array_equal(np.asarray(t.todense()), golden)

    def test_block_assignment(self):
        """Whole-tensor data round-trip (reference testing/api.py:274; the
        functional analog of ``A[:] = data`` is construction)."""
        dense = np.asarray(
            symmetrize(jnp.arange(5.0**3).reshape((5,) * 3))
        )
        t = self.tensor_cls.from_dense(jnp.asarray(dense))
        np.testing.assert_allclose(
            np.asarray(t.todense()), dense, atol=self.atol
        )

    def test_sigma_class_assignment(self):
        """σ-class indexing/assignment layout contract
        (reference testing/api.py:308-332)."""
        self._skip_if_readonly()
        dim = 5
        t = self.tensor_cls.zeros(3, dim)
        b = 0
        for label in t.perm_classes:
            size = comb.class_size(comb.as_class_counts(label), dim)
            if label == "iii":
                t = t.at[label].set(0.0)
            else:
                t = t.at[label].set(jnp.arange(b, b + size, dtype=t.dtype))
            b += size
        assert all(float(t[i, i, i]) == 0 for i in range(dim))
        # class vector order must match permcls_indep_iter_repindex order
        iij = np.atleast_1d(np.asarray(t["iij"]))
        reps = list(t.permcls_indep_iter_repindex("iij"))
        k = reps.index((0, 0, 3))
        assert float(t[0, 0, 3]) == iij[k]
        k = reps.index((2, 2, 3))
        assert float(t[2, 2, 3]) == iij[k]
        ijk = np.atleast_1d(np.asarray(t["ijk"]))
        reps = list(t.permcls_indep_iter_repindex("ijk"))
        k = reps.index((1, 2, 3))
        assert float(t[1, 2, 3]) == ijk[k]

    def test_partial_indexing(self):
        """reference testing/api.py:335-360."""
        rng = self._rng()
        for t, dense in self.sweep(rng, max_rank=3, max_dim=3):
            if t.rank < 2:
                continue
            for i in range(t.dim):
                np.testing.assert_allclose(
                    np.asarray(t[i].todense()), dense[i], atol=self.atol
                )
        rank, dim = 4, 3
        t, dense = self.make(rank, dim, rng)
        np.testing.assert_allclose(
            np.asarray(t[0, 1, :, :].todense()), dense[0, 1], atol=self.atol
        )
        assert t[0, 1, :, :].allclose(t[1, 0, :, :])
        assert t[0, 1, 1, :].allclose(t[1, 1, 0, :])
        sub = t[0, 0, 0, :]
        for i in range(dim):
            np.testing.assert_allclose(
                float(sub[i]), float(t[0, 0, 0, i]), atol=self.atol
            )

    def test_negative_indices(self):
        """Uniform NumPy-style wraparound across formats (round-1 advisory:
        formats disagreed on negative indices)."""
        import pytest

        rng = self._rng()
        rank, dim = self.ranks_dims[0]
        t, dense = self.make(rank, dim, rng)
        idx = (-1,) + (0,) * (rank - 1)
        np.testing.assert_allclose(
            float(t[idx]), dense[(dim - 1,) + (0,) * (rank - 1)],
            atol=self.atol,
        )
        with pytest.raises(IndexError):
            t[(dim,) + (0,) * (rank - 1)]
        with pytest.raises(IndexError):
            t[(-dim - 1,) + (0,) * (rank - 1)]

    def test_correspondence_index_value_iterators(self):
        """flat count = d^r; indep count = C(d+r−1,r); values match indices
        (reference testing/api.py:247-272)."""
        rng = self._rng()
        rank, dim = self.ranks_dims[0]
        t, dense = self.make(rank, dim, rng)
        assert len(list(t.flat)) == dim**rank
        assert len(list(t.flat_index)) == dim**rank
        # flat zips with flat_index: reassembling the pairs rebuilds the
        # dense tensor exactly (reference base.py:893-897 contract; the
        # iteration order itself is format-chosen)
        rebuilt = np.zeros((dim,) * rank)
        seen = set()
        for idx, v in zip(t.flat_index, t.flat):
            assert idx not in seen, f"flat_index repeated {idx}"
            seen.add(idx)
            rebuilt[idx] = float(v)
        np.testing.assert_allclose(rebuilt, dense, atol=self.atol)
        vals = list(t.indep_iter())
        reps = list(t.indep_iter_repindex())
        assert len(vals) == len(reps) == t.indep_size
        for v, rep in zip(vals, reps):
            np.testing.assert_allclose(float(v), dense[rep], atol=self.atol)
        for adv, rep in zip(t.indep_iter_index(), reps):
            assert np.all(np.sort(np.stack(adv), axis=0)[:, 0] == np.sort(rep))

    def test_copy(self):
        rng = self._rng()
        t, _ = self.make(*self.ranks_dims[0], rng)
        assert t.copy().allclose(t)

    def test_asarray_warns(self):
        """Implicit densification warns (reference testing/api.py:433; the
        `like=` escape hatch is replaced by explicit .todense())."""
        import pytest

        rng = self._rng()
        t, dense = self.make(*self.ranks_dims[0], rng)
        with pytest.warns(UserWarning):
            arr = np.asarray(t)
        assert type(arr) is np.ndarray
        np.testing.assert_allclose(arr, dense, atol=self.atol)

    def test_eq_raises(self):
        """`==`/`!=` raise instead of silently comparing identity."""
        import pytest

        rng = self._rng()
        a, _ = self.make(*self.ranks_dims[0], rng)
        with pytest.raises(TypeError):
            a == a  # noqa: B015
        with pytest.raises(TypeError):
            a != a  # noqa: B015

    def test_arithmetic_ufuncs(self):
        """+/−/× with scalars and np/symalg ufunc interop, exp∘log identity
        (reference testing/api.py:446-473)."""
        from .. import ops as symalg

        rng = self._rng()
        rank, dim = self.ranks_dims[0]
        a, da = self.make(rank, dim, rng)
        b = np.add(a, 1.0)  # NEP-13 routed, stays compressed
        assert not isinstance(b, np.ndarray)
        assert b.allclose(a + 1.0)
        assert (b - 1.0).allclose(a)
        assert np.multiply(np.multiply(b, -1.0), -1.0).allclose(b)
        assert symalg.log(symalg.exp(b)).allclose(b)
        assert np.log(np.exp(b)).allclose(b)
        # scalar ** tensor and tensor ** scalar both work
        two_pow = 2.0**a
        assert two_pow.allclose(symalg.apply(lambda x: 2.0**x, a))
        assert (a**2.0).allclose(a * a)

    def test_unsymmetrized_outer_raises(self):
        """np.multiply.outer on SymmetricTensors is refused — use
        symalg.multiply.outer (reference testing/api.py:481-485)."""
        import pytest

        rng = self._rng()
        a, _ = self.make(2, 3, rng)
        b, _ = self.make(1, 3, rng)
        with pytest.raises(TypeError):
            np.multiply.outer(a, b)

    def test_outer_product_cases(self):
        """Unit-vector outer and ones-tensor outer oracles
        (reference testing/api.py:474-513)."""
        from .. import ops as symalg

        e1 = self.tensor_cls.from_dense(jnp.asarray([1.0, 0.0]))
        e2 = self.tensor_cls.from_dense(jnp.asarray([0.0, 1.0]))
        prod = symalg.multiply.outer(e1, e2)
        assert float(prod[0, 0]) == 0 and float(prod[1, 1]) == 0
        assert float(np.atleast_1d(np.asarray(prod["ij"]))[0]) == 0.5
        rng = self._rng()
        for a, da in self.sweep(rng, max_rank=3, max_dim=2):
            ones = self.tensor_cls.from_dense(
                jnp.ones((a.dim,) * a.rank)
            )
            out = symalg.multiply.outer(a, ones)
            oracle = np.asarray(
                symmetrize(np.multiply.outer(da, np.ones((a.dim,) * a.rank)))
            )
            np.testing.assert_allclose(
                np.asarray(out.todense()), oracle, atol=self.atol * 10
            )

    def test_tensordot_sweep(self):
        """Pairwise sweep over small tensors, axes ∈ {0, 1, (0,1), 2,
        ((0,1,2),(0,1,2))} vs dense symmetrized oracle
        (reference testing/api.py:519-573)."""
        from .. import ops as symalg

        rng = self._rng()
        pool = list(self.sweep(rng, max_rank=4, max_dim=2))
        for (a, da), (b, db) in itertools.combinations(pool, 2):
            if a.dim != b.dim or a.rank + b.rank > 9:
                continue
            if a.dim ** (a.rank + b.rank) > 1e6:
                continue
            t0 = symalg.tensordot(a, b, axes=0)
            assert t0.allclose(symalg.multiply.outer(a, b), atol=1e-7)
            t1 = symalg.tensordot(a, b, axes=1)
            o1 = np.asarray(symmetrize(np.tensordot(da, db, axes=1)))
            np.testing.assert_allclose(
                np.asarray(t1.todense()), o1, atol=1e-7
            )
            t1b = symalg.tensordot(a, b, axes=(0, 1))
            assert (
                t1b.allclose(t1, atol=1e-7)
                if hasattr(t1b, "allclose")
                else np.allclose(np.asarray(t1b), np.asarray(t1), atol=1e-7)
            )
            if a.rank >= 2 and b.rank >= 2:
                t2 = symalg.tensordot(a, b, axes=2)
                o2 = symmetrize(np.tensordot(da, db, axes=2))
                got = (
                    np.asarray(t2.todense())
                    if hasattr(t2, "todense")
                    else np.asarray(t2)
                )
                np.testing.assert_allclose(got, np.asarray(o2), atol=1e-7)
            if a.rank > 2 and b.rank > 2:
                t3 = symalg.tensordot(a, b, axes=((0, 1, 2), (0, 1, 2)))
                for perm in ((0, 1, 2), (2, 1, 0), (2, 0, 1)):
                    o3 = symmetrize(
                        np.tensordot(da, db, axes=((0, 1, 2), perm))
                    )
                    got = (
                        np.asarray(t3.todense())
                        if hasattr(t3, "todense")
                        else np.asarray(t3)
                    )
                    np.testing.assert_allclose(got, np.asarray(o3), atol=1e-7)

    def test_contract_all_indices_with_matrix(self):
        """Basis-change oracle incl. chained and rectangular W
        (reference testing/api.py:576-615)."""
        from .. import ops as symalg

        rng = self._rng()
        a, da = self.make(3, 3, rng)
        for _ in range(2):
            W = rng.normal(size=(3, 3))
            got = symalg.contract_all_indices_with_matrix(a, jnp.asarray(W))
            oracle = np.asarray(
                symmetrize(np.einsum("abc,ai,bj,ck->ijk", da, W, W, W))
            )
            np.testing.assert_allclose(
                np.asarray(got.todense()), oracle, atol=1e-7
            )
        # chained application on the result (reference does C = f(B); f(C))
        C = symalg.contract_all_indices_with_matrix(
            a, jnp.asarray(rng.normal(size=(3, 3)))
        )
        W = rng.normal(size=(3, 3))
        got = symalg.contract_all_indices_with_matrix(C, jnp.asarray(W))
        oracle = np.asarray(
            symmetrize(
                np.einsum("abc,ai,bj,ck->ijk", np.asarray(C.todense()), W, W, W)
            )
        )
        np.testing.assert_allclose(np.asarray(got.todense()), oracle, atol=1e-7)
        # rectangular W changes the dimension (capability beyond the
        # reference's square-only tests)
        W = rng.normal(size=(3, 5))
        got = symalg.contract_all_indices_with_matrix(a, jnp.asarray(W))
        assert got.dim == 5
        oracle = np.asarray(
            symmetrize(np.einsum("abc,ai,bj,ck->ijk", da, W, W, W))
        )
        np.testing.assert_allclose(np.asarray(got.todense()), oracle, atol=1e-7)

    def test_contract_tensor_list(self):
        """reference testing/api.py:618-654."""
        from .. import ops as symalg

        rng = self._rng()
        for dim in (2, 3, 4):
            t, td = self.make(3, dim, rng)
            chis, chi_dense = [], np.zeros((dim,) * 3)
            for i in range(dim):
                c, cd = self.make(2, dim, rng)
                chis.append(c)
                chi_dense[i] = cd
            c1 = symalg.contract_tensor_list(t, chis, n_times=1, rule="all")
            o1 = np.asarray(
                symmetrize(np.einsum("ija,akl->ijkl", td, chi_dense))
            )
            np.testing.assert_allclose(
                np.asarray(c1.todense()), o1, atol=1e-7
            )
            c2 = symalg.contract_tensor_list(t, chis, n_times=2, rule="all")
            o2 = np.asarray(
                symmetrize(
                    np.einsum("iab,ajk,blm->ijklm", td, chi_dense, chi_dense)
                )
            )
            np.testing.assert_allclose(
                np.asarray(c2.todense()), o2, atol=1e-7
            )

    def test_contract_all_indices_with_vector_cases(self):
        """Vector contraction incl. the zero vector
        (reference testing/api.py:657-672)."""
        from .. import ops as symalg

        rng = self._rng()
        a, da = self.make(3, 3, rng)
        for x in (rng.normal(size=3), rng.normal(size=3), np.zeros(3)):
            got = float(
                symalg.contract_all_indices_with_vector(a, jnp.asarray(x))
            )
            expect = float(np.einsum("abc,a,b,c->", da, x, x, x))
            np.testing.assert_allclose(got, expect, atol=1e-7)
