"""Abstract base for symmetric tensors, JAX-first.

Design deltas vs the reference's ``SymmetricTensor`` ABC
(/root/reference/symtensor/base.py:330):

- Tensors are **immutable registered pytrees**: leaves are ``jax.Array``s,
  aux data is the static (rank, dim, format) signature. ``jit``/``vmap``/
  ``grad`` work through them for free (replaces the torch backend's
  detach/clone story, torch_symtensor.py:202-224).
- No NEP-13/18 duck-array dispatch (base.py:1048-1143). Arithmetic goes
  through normal dunders + an explicit ``symtensor_tpu.symalg`` namespace.
- Mutation is functional: ``A.at['iij'].set(v)`` / ``A.at[1,2,2].set(v)``
  return new tensors (reference ``__setitem__`` semantics, including
  "assigning one index updates its whole index class",
  testing/api.py:285-301, are honored by the tests).
- Iterators (``indep_iter`` etc., base.py:910-1011) are host-side
  conveniences; hot paths use vectorized index tables instead.
"""

from __future__ import annotations

import itertools
import math
import warnings
from typing import Any, Iterator, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..utils import combinatorics as comb
from ..utils.tables import Tables, tables

Key = Union[str, int, Tuple[int, ...], slice]


def default_dtype():
    return jnp.dtype(config.default_dtype)


class SymmetricTensor:
    """Common API of all storage formats. Not an ABC in the registry sense —
    concrete formats subclass this and register themselves as pytrees."""

    # Subclasses set this to a short format name used in repr/serialization.
    format: str = "abstract"

    rank: int
    dim: int

    # ------------------------------------------------------------ structure

    @property
    def tables(self) -> Tables:
        return tables(self.rank, self.dim)

    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.dim,) * self.rank

    @property
    def ndim(self) -> int:
        return self.rank

    @property
    def dense_size(self) -> int:
        return self.dim**self.rank

    @property
    def indep_size(self) -> int:
        """Number of independent components C(d+r−1, r)
        (reference base.py:833)."""
        return comb.indep_size(self.rank, self.dim)

    @property
    def data_alignment(self) -> str:
        """Storage-layout tag (reference base.py:782): binary ops between
        tensors with equal alignment take the fused leafwise path. Here the
        format name doubles as the alignment key, since every format stores
        independent components in one canonical order."""
        return self.format

    @property
    def perm_classes(self) -> Tuple[str, ...]:
        """σ-class labels, largest multiplicity first ('iii', 'iij', …)."""
        return tuple(comb.class_label(c) for c in comb.perm_classes(self.rank))

    @property
    def size(self) -> int:
        """Number of stored elements (format-specific; reference
        base.py:805)."""
        raise NotImplementedError

    @property
    def dtype(self):
        raise NotImplementedError

    # ------------------------------------------------------------- content

    def todense(self) -> jnp.ndarray:
        """Materialize the full d^r dense array. Guarded by
        config.max_dense_elements."""
        raise NotImplementedError

    def toflat(self) -> "FlatSymmetricTensor":  # noqa: F821
        raise NotImplementedError

    def topermcls(self) -> "PermClsSymmetricTensor":  # noqa: F821
        from .permcls import PermClsSymmetricTensor

        flat = self.toflat()
        return PermClsSymmetricTensor.from_flat(flat)

    def astype(self, dtype) -> "SymmetricTensor":
        raise NotImplementedError

    def copy(self) -> "SymmetricTensor":
        """Tensors are immutable; copy is the identity (kept for reference
        API parity, base.py:761)."""
        return self

    def transpose(self, *axes) -> "SymmetricTensor":
        """No-op: symmetric tensors are invariant under axis permutation
        (reference base.py:1043)."""
        return self

    @property
    def T(self) -> "SymmetricTensor":
        return self

    # ----------------------------------------------------------- indexing

    def class_values(self, cls) -> jnp.ndarray:
        """Values of one σ-class as a 1-D array in storage order (reference
        ``A['iij']``, permcls_symtensor.py:730)."""
        raise NotImplementedError

    def _canon_index(self, idx) -> Tuple:
        """Normalize a concrete multi-index uniformly across formats:
        negative entries wrap NumPy-style, out-of-range entries raise
        IndexError. Traced entries pass through unvalidated (their range is
        a device-side concern)."""
        out = []
        for k in idx:
            if isinstance(k, (int, np.integer)):
                kk = int(k)
                if kk < 0:
                    kk += self.dim
                if not 0 <= kk < self.dim:
                    raise IndexError(
                        f"index {int(k)} out of range for dim {self.dim}"
                    )
                out.append(kk)
            else:
                out.append(k)
        return tuple(out)

    def element(self, idx: Sequence[int]) -> jnp.ndarray:
        """One element by full multi-index; traced indices allowed."""
        raise NotImplementedError

    def _partial(self, idx: Tuple[int, ...]) -> "SymmetricTensor":
        """Partial indexing by k < rank leading indices → rank−k tensor."""
        raise NotImplementedError

    def __getitem__(self, key: Key):
        if isinstance(key, str):
            return self.class_values(key)
        if isinstance(key, (int, np.integer)) or (
            hasattr(key, "ndim") and getattr(key, "ndim", None) == 0
        ):
            key = (key,)
        if isinstance(key, tuple):
            if len(key) > self.rank:
                raise IndexError(
                    f"too many indices ({len(key)}) for rank {self.rank}"
                )
            if any(isinstance(k, slice) for k in key):
                # trailing full slices are allowed and ignored: A[i, :, :]
                nslice = sum(1 for k in key if isinstance(k, slice))
                if any(
                    not isinstance(k, slice) for k in key[len(key) - nslice :]
                ) or any(
                    isinstance(k, slice) and k != slice(None) for k in key
                ):
                    raise IndexError(
                        "only trailing full slices are supported in indexing"
                    )
                key = key[: len(key) - nslice]
            key = self._canon_index(key)
            if len(key) == self.rank:
                return self.element(key)
            return self._partial(key)
        if key is Ellipsis or (isinstance(key, slice) and key == slice(None)):
            return self
        raise IndexError(f"unsupported index {key!r}")

    @property
    def at(self) -> "_AtHelper":
        """Functional update helper: ``A.at['iij'].set(v)``,
        ``A.at[1,2,2].set(v)`` (sets the whole index class, matching
        reference __setitem__ semantics), ``.add(v)`` likewise."""
        return _AtHelper(self)

    def set_class(self, cls, value) -> "SymmetricTensor":
        raise NotImplementedError

    def set_element(self, idx: Sequence[int], value) -> "SymmetricTensor":
        raise NotImplementedError

    def add_class(self, cls, value) -> "SymmetricTensor":
        c = comb.as_class_counts(cls)
        return self.set_class(c, self.class_values(c) + jnp.asarray(value))

    def add_element(self, idx, value) -> "SymmetricTensor":
        return self.set_element(idx, self.element(idx) + jnp.asarray(value))

    # --------------------------------------------------------- iterators
    # Host-side conveniences for reference API parity (base.py:888-1011).
    # They materialize small index tables on the host; never use in hot code.

    def indep_iter(self) -> Iterator:
        """Values of independent components, storage order."""
        vals = np.asarray(self.toflat().data)
        return iter(vals)

    def indep_iter_repindex(self) -> Iterator[Tuple[int, ...]]:
        """Representative (ascending) index of each independent component."""
        rep = self.tables.rep_np()
        return (tuple(int(v) for v in row) for row in rep)

    def indep_iter_index(self) -> Iterator[Tuple[np.ndarray, ...]]:
        """Advanced index (all permutations) of each independent component
        (reference base.py:919)."""
        for rep in self.indep_iter_repindex():
            perms = np.array(list(comb.distinct_permutations(rep)))
            yield tuple(perms.T)

    def permcls_indep_iter(self, cls=None) -> Iterator:
        """Values of independent components, optionally restricted to one
        σ-class, storage order."""
        vals = np.asarray(self.toflat().data)
        if cls is None:
            for c in comb.perm_classes(self.rank):
                yield from vals[self.tables.class_positions_np(c)]
        else:
            yield from vals[
                self.tables.class_positions_np(comb.as_class_counts(cls))
            ]

    def permcls_indep_iter_repindex(self, cls=None) -> Iterator[Tuple[int, ...]]:
        rep = self.tables.rep_np()
        if cls is None:
            for c in comb.perm_classes(self.rank):
                for row in rep[self.tables.class_positions_np(c)]:
                    yield tuple(int(v) for v in row)
        else:
            for row in rep[
                self.tables.class_positions_np(comb.as_class_counts(cls))
            ]:
                yield tuple(int(v) for v in row)

    def permcls_multiplicity_iter(self) -> Iterator[int]:
        """γ per independent component, storage order (base.py:1011)."""
        gamma = np.asarray(self.tables.multiplicity)
        for c in comb.perm_classes(self.rank):
            for g in gamma[self.tables.class_positions_np(c)]:
                yield int(g)

    # --------------------------------------------- dict-style storage views
    # Reference contract (base.py:854-887): keys() is a KeysView over the
    # underlying data layout — the single key () for single-array formats,
    # σ-class count tuples for PermCls — and values() yields the matching
    # storage arrays, so generic code can apply elementwise ops leaf-wise.

    def keys(self):
        """KeysView over the underlying storage (reference base.py:854-869).
        Single-array formats (flat, dense) expose the single key ``()``;
        formats with structured storage override."""
        return dict.fromkeys([()]).keys()

    def values(self) -> Iterator:
        """Iterator over the underlying data arrays, aligned with
        :meth:`keys` (reference base.py:870-881)."""
        return iter([self.data])

    def items(self) -> Iterator:
        """``zip(keys(), values())`` (reference base.py:882-887)."""
        return zip(self.keys(), self.values())

    def __iter__(self) -> Iterator:
        """Yield the ``dim`` rank-(r−1) sub-tensors ``self[i]``
        (reference base.py:751-756)."""
        for i in range(self.dim):
            yield self[i]

    @property
    def flat(self) -> Iterator:
        """All d^r component values, each independent component repeated
        by its multiplicity γ, in storage order.  Matches the reference
        contract (base.py:888-899): the order deliberately differs from
        NumPy's C-order ``flat`` and is zippable with :attr:`flat_index`.
        Streams straight from packed storage — never materializes d^r
        (reference PermCls does the same, permcls_symtensor.py:903), so
        iteration starts immediately even at flagship sizes.  Dense
        storage overrides with the native C-order view."""

        def gen():
            vals = np.asarray(self.toflat().data)
            gamma = np.asarray(self.tables.multiplicity)
            for i in range(vals.shape[0]):
                v = vals[i]
                for _ in range(int(gamma[i])):
                    yield v

        return gen()

    @property
    def flat_index(self) -> Iterator[Tuple[int, ...]]:
        """Each index tuple exactly once, grouped per independent
        component (every distinct permutation of its representative, in
        sorted order), aligned with :attr:`flat` (reference
        base.py:900-908, permcls flat_index permcls_symtensor.py:921)."""

        def gen():
            rep = self.tables.rep_np()
            for row in rep:
                base_idx = tuple(int(v) for v in row)
                for p in sorted(set(itertools.permutations(base_idx))):
                    yield p

        return gen()

    # --------------------------------------------------------- arithmetic

    def _binary(self, other, op_name: str, reverse: bool = False):
        from ..ops import elementwise

        return elementwise.binary(op_name, self, other, reverse=reverse)

    def __add__(self, other):
        return self._binary(other, "add")

    def __radd__(self, other):
        return self._binary(other, "add", reverse=True)

    def __sub__(self, other):
        return self._binary(other, "subtract")

    def __rsub__(self, other):
        return self._binary(other, "subtract", reverse=True)

    def __mul__(self, other):
        return self._binary(other, "multiply")

    def __rmul__(self, other):
        return self._binary(other, "multiply", reverse=True)

    def __truediv__(self, other):
        return self._binary(other, "divide")

    def __rtruediv__(self, other):
        return self._binary(other, "divide", reverse=True)

    def __pow__(self, other):
        return self._binary(other, "power")

    def __rpow__(self, other):
        return self._binary(other, "power", reverse=True)

    def __neg__(self):
        from ..ops import elementwise

        return elementwise.unary(jnp.negative, self)

    def __pos__(self):
        return self

    def __abs__(self):
        from ..ops import elementwise

        return elementwise.unary(jnp.abs, self)

    # -------------------------------------------------------- comparisons

    def allclose(self, other, rtol=1e-5, atol=1e-8) -> bool:
        from ..ops import elementwise

        return elementwise.allclose(self, other, rtol=rtol, atol=atol)

    def array_equal(self, other) -> bool:
        from ..ops import elementwise

        return elementwise.array_equal(self, other)

    def __eq__(self, other):
        """`==` is refused: the reference treats comparison elementwise
        (base.py:1537-1591) while Python's default would silently compare
        object identity — an error is safer than either surprise."""
        raise TypeError(
            "elementwise `==` on SymmetricTensor is not supported; use "
            "A.array_equal(B) for exact equality, A.allclose(B) for "
            "tolerance, or symalg.isclose(A, B) for an elementwise result"
        )

    def __ne__(self, other):
        raise TypeError(
            "elementwise `!=` on SymmetricTensor is not supported; use "
            "`not A.array_equal(B)` or symalg.isclose(A, B)"
        )

    # ------------------------------------------------------------- interop

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        """NEP-13 hook so `np.exp(A)`, `np.add(A, B)` etc. stay compressed
        (reference __array_ufunc__, base.py:1081-1143; generic defaults
        :1145-1362). Only elementwise `__call__` is supported — in
        particular `np.multiply.outer(A, B)` raises, because the
        *unsymmetrized* outer of symmetric tensors is not symmetric; use
        `symalg.multiply.outer` (reference testing/api.py:481-485)."""
        from ..ops import elementwise

        if kwargs.get("out") is not None:
            raise TypeError(
                "out= is unsupported: SymmetricTensors are immutable"
            )
        if method != "__call__":
            raise TypeError(
                f"np.{ufunc.__name__}.{method} is not defined for "
                "SymmetricTensors; for the symmetrized outer product use "
                "symalg.add/subtract/multiply .outer"
            )
        if ufunc.nin == 1 and ufunc.nout == 1:
            fn = getattr(jnp, ufunc.__name__, None)
            if fn is None:
                return NotImplemented
            return elementwise.unary(fn, self)
        name_map = {
            "add": "add",
            "subtract": "subtract",
            "multiply": "multiply",
            "divide": "divide",
            "true_divide": "divide",
            "power": "power",
        }
        op = name_map.get(ufunc.__name__)
        if op is None or ufunc.nin != 2:
            return NotImplemented
        a, b = inputs
        reverse = b is self and not isinstance(a, SymmetricTensor)
        if reverse:
            a, b = b, a
        return elementwise.binary(op, a, b, reverse=reverse)

    def __array_function__(self, func, types, args, kwargs):
        """NEP-18 hook. `np.tensordot` is blocked with an instructive
        error (the reference does the same, symalg.py:341-347): the plain
        tensordot of symmetric tensors is not symmetric, and silently
        densifying it invites wrong results.  Comparison/inspection
        functions (`np.allclose`, `np.isclose`, `np.array_equal`,
        `np.result_type`, `np.all`, `np.any`) run natively on packed
        storage — never densifying — matching the reference's
        implementations (base.py:1454-1684).  Everything else falls back
        to densify-with-warning via `__array__` (NumPy's default path)."""
        import numpy as _np

        if func is _np.tensordot:
            raise TypeError(
                "np.tensordot of SymmetricTensors is not symmetrized; use "
                "symalg.tensordot (reference symalg.py:341-347)"
            )
        handler = _array_function_impls().get(func)
        if handler is not None:
            hkw = kwargs
            if func in (_np.asarray, _np.asanyarray, _np.empty):
                # NEP-35 creation functions: numpy strips `like=` before
                # dispatching — the like object is `self`.  Injected only
                # for the handler call: the densify fallback below must
                # not re-trigger dispatch through a SymmetricTensor like.
                hkw = {**kwargs, "like": kwargs.get("like", self)}
            res = handler(*args, **hkw)
            if res is not NotImplemented:
                return res
        densified = tuple(
            _np.asarray(a) if isinstance(a, SymmetricTensor) else a
            for a in args
        )
        return func(*densified, **kwargs)

    @classmethod
    def __get_pydantic_core_schema__(cls, source_type, handler):
        """Pydantic-v2 field support: a SymmetricTensor field validates
        from an instance or the JSON-codec dict and serializes through
        `serialization.to_dict` — the reference embeds tensors in
        pydantic models via its scityping codec (testing/api.py:420-424).
        Only invoked when pydantic introspects the annotation; the
        library works without pydantic installed."""
        from pydantic_core import core_schema

        from .. import serialization as _ser

        def _validate(v):
            if isinstance(v, SymmetricTensor):
                return v
            if isinstance(v, dict):
                return _ser.from_dict(v)
            raise TypeError(
                "expected a SymmetricTensor or its serialization dict; "
                f"got {type(v).__name__}"
            )

        return core_schema.no_info_plain_validator_function(
            _validate,
            serialization=core_schema.plain_serializer_function_ser_schema(
                _ser.to_dict, info_arg=False
            ),
        )

    def __array__(self, dtype=None):
        """NumPy interop: densifies with a warning (reference base.py:1027)."""
        warnings.warn(
            f"Implicitly densifying {type(self).__name__} "
            f"(rank {self.rank}, dim {self.dim}) to a NumPy array.",
            stacklevel=2,
        )
        arr = np.asarray(self.todense())
        return arr.astype(dtype) if dtype is not None else arr

    def memory_footprint(self) -> int:
        """Bytes of stored leaf data (replaces the reference's
        mackelab total_size hook, utils.py:1092)."""
        return sum(
            leaf.size * leaf.dtype.itemsize
            for leaf in jax.tree_util.tree_leaves(self)
        )

    def __repr__(self):
        return (
            f"{type(self).__name__}(rank={self.rank}, dim={self.dim}, "
            f"dtype={self.dtype}, size={self.size})"
        )

    __hash__ = None  # type: ignore[assignment]


class _AtHelper:
    def __init__(self, t: SymmetricTensor):
        self._t = t

    def __getitem__(self, key: Key) -> "_AtRef":
        return _AtRef(self._t, key)


class _AtRef:
    def __init__(self, t: SymmetricTensor, key: Key):
        self._t = t
        self._key = key

    def _dispatch(self, setter_cls, setter_el, value):
        t, key = self._t, self._key
        if isinstance(key, str):
            return setter_cls(comb.as_class_counts(key), value)
        if isinstance(key, (int, np.integer)):
            key = (key,)
        if isinstance(key, tuple):
            if len(key) != t.rank:
                raise IndexError(
                    "functional updates need a σ-class label or a full "
                    f"multi-index of length {t.rank}; got {key!r}"
                )
            return setter_el(t._canon_index(key), value)
        if key is Ellipsis:
            raise IndexError("whole-tensor assignment: construct a new tensor")
        raise IndexError(f"unsupported update key {key!r}")

    def set(self, value):
        return self._dispatch(self._t.set_class, self._t.set_element, value)

    def add(self, value):
        return self._dispatch(self._t.add_class, self._t.add_element, value)


def _check_dense_size(rank: int, dim: int, what: str = "todense") -> None:
    if dim**rank > config.max_dense_elements:
        raise MemoryError(
            f"{what}: dense size {dim}^{rank} = {dim**rank:,} exceeds "
            f"config.max_dense_elements = {config.max_dense_elements:,}"
        )


_ARRAY_FUNCTION_IMPLS: dict = {}


def _array_function_impls() -> dict:
    """Native NEP-18 implementations, built lazily (ops.elementwise imports
    this module).  Each handler returns NotImplemented for operand
    combinations it does not cover natively — `__array_function__` then
    falls back to densify-with-warning.  Reference: the `@implements`
    registry and handlers at /root/reference/symtensor/base.py:1454-1684."""
    if _ARRAY_FUNCTION_IMPLS:
        return _ARRAY_FUNCTION_IMPLS
    from ..ops import elementwise as _ew

    def _st_or_scalar(x) -> bool:
        return isinstance(x, SymmetricTensor) or _ew._is_scalar(x)

    def _allclose(a, b, rtol=1e-5, atol=1e-8, equal_nan=False):
        if not (_st_or_scalar(a) and _st_or_scalar(b)):
            return NotImplemented
        return _ew.allclose(a, b, rtol=rtol, atol=atol, equal_nan=equal_nan)

    def _isclose(a, b, rtol=1e-5, atol=1e-8, equal_nan=False):
        if not (_st_or_scalar(a) and _st_or_scalar(b)):
            return NotImplemented
        if (
            isinstance(a, SymmetricTensor)
            and isinstance(b, SymmetricTensor)
            and (a.rank, a.dim) != (b.rank, b.dim)
        ):
            return NotImplemented  # numpy broadcasting semantics (densify)
        return _ew.isclose(a, b, rtol=rtol, atol=atol, equal_nan=equal_nan)

    def _array_equal(a, b, equal_nan=False):
        if not (
            isinstance(a, SymmetricTensor) and isinstance(b, SymmetricTensor)
        ):
            return NotImplemented
        return _ew.array_equal(a, b)

    def _result_type(*arrays_and_dtypes):
        return np.result_type(
            *(
                a.dtype if isinstance(a, SymmetricTensor) else a
                for a in arrays_and_dtypes
            )
        )

    def _all(a, *args, **kwargs):
        if not isinstance(a, SymmetricTensor) or args or kwargs:
            return NotImplemented
        # every dense element equals some packed component, so truthiness
        # over packed storage == truthiness over the dense tensor
        return bool(jnp.all(a.toflat().data))

    def _any(a, *args, **kwargs):
        if not isinstance(a, SymmetricTensor) or args or kwargs:
            return NotImplemented
        return bool(jnp.any(a.toflat().data))

    def _asarray(a=None, dtype=None, order=None, *, like=None, **kwargs):
        # NEP-35: np.asarray only reaches __array_function__ when `like=`
        # is passed, or when `a` itself is a SymmetricTensor AND like= is
        # present (reference base.py:1467-1485 relies on its
        # make_array_like bypass for the plain form; here the plain form
        # densifies through __array__ as documented).  These handlers are
        # TERMINAL (they raise instead of returning NotImplemented):
        # the generic fallback re-calls func with `like=` intact, which
        # would dispatch right back here.
        if isinstance(a, SymmetricTensor):
            return a if dtype is None or jnp.dtype(dtype) == a.dtype \
                else a.astype(dtype)
        if isinstance(like, SymmetricTensor) and a is not None:
            arr = np.asarray(a, dtype=dtype)
            if arr.shape != (like.dim,) * arr.ndim:
                raise ValueError(
                    f"np.asarray(..., like=<{type(like).__name__}>) needs "
                    f"square data of dim {like.dim}; got shape {arr.shape}"
                )
            return type(like).from_dense(arr)
        return NotImplemented

    def _empty(shape, dtype=None, order="C", *, like=None, **kwargs):
        # np.empty(shape, like=A) → a zero tensor of A's format (the
        # reference returns its default-constructed empty tensor,
        # base.py:1493-1505); shape must be square.  Terminal — see
        # _asarray.
        if not isinstance(like, SymmetricTensor):
            return NotImplemented
        if isinstance(shape, (int, np.integer)):
            shape = (int(shape),)
        shape = tuple(int(s) for s in shape)
        if len(set(shape)) > 1:
            raise ValueError(
                "np.empty(like=SymmetricTensor) needs a square shape; "
                f"got {shape} (reference base.py:1496)"
            )
        rank = len(shape)
        dim = shape[0] if shape else like.dim
        zeros = getattr(type(like), "zeros", None)
        if zeros is not None:
            return zeros(rank, dim, dtype=dtype)
        # formats without a zeros helper (sparse): build through flat
        from .flat import FlatSymmetricTensor as _Flat

        flat = _Flat.zeros(rank, dim, dtype=dtype)
        from_flat = getattr(type(like), "from_flat", None)
        if from_flat is None:
            raise TypeError(
                f"{type(like).__name__} has no zeros/from_flat constructor "
                "for np.empty(like=...)"
            )
        return from_flat(flat)

    _ARRAY_FUNCTION_IMPLS.update(
        {
            np.allclose: _allclose,
            np.isclose: _isclose,
            np.array_equal: _array_equal,
            np.result_type: _result_type,
            np.all: _all,
            np.any: _any,
            np.asarray: _asarray,
            np.asanyarray: _asarray,
            np.empty: _empty,
        }
    )
    return _ARRAY_FUNCTION_IMPLS
