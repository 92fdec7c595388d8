"""FlatSymmetricTensor — the packed workhorse format.

One contiguous 1-D leaf of the C(d+r−1, r) independent components in gflat
order (see utils/combinatorics.py). Closed-form O(r) addressing replaces the
reference's per-(rank,dim) position dictionaries
(permcls_symtensor.py:422-445) and its lexicographic ranking
(flat_symtensor.py:39-50); the grouped layout is what lets
`contract_all_indices_with_vector` run as d static-shape GEMVs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..utils import combinatorics as comb
from .base import SymmetricTensor, _check_dense_size, default_dtype


@jax.tree_util.register_pytree_node_class
class FlatSymmetricTensor(SymmetricTensor):
    format = "flat"

    def __init__(
        self,
        rank: Optional[int] = None,
        dim: Optional[int] = None,
        data=None,
        dtype=None,
    ):
        """Create from packed data (length C(d+r−1, r)) or zeros.

        To create from a dense array use `from_dense`; from per-class data
        use `PermClsSymmetricTensor(...).toflat()`.
        """
        if data is None:
            if rank is None or dim is None:
                raise ValueError("need rank and dim when no data is given")
            n = comb.indep_size(rank, dim)
            data = jnp.zeros((n,), dtype=dtype or default_dtype())
        else:
            data = jnp.asarray(data, dtype=dtype)
            if rank is None or dim is None:
                raise ValueError(
                    "packed data is ambiguous without rank and dim"
                )
            n = comb.indep_size(rank, dim)
            if data.ndim != 1 or data.shape[0] != n:
                raise ValueError(
                    f"packed data must have shape ({n},) for rank {rank} "
                    f"dim {dim}; got {data.shape}"
                )
        self.rank = int(rank)
        self.dim = int(dim)
        self.data = data

    # ------------------------------------------------------------- pytree

    def tree_flatten(self):
        return (self.data,), (self.rank, self.dim)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj.rank, obj.dim = aux
        (obj.data,) = leaves
        return obj

    @classmethod
    def _raw(cls, rank: int, dim: int, data) -> "FlatSymmetricTensor":
        return cls.tree_unflatten((rank, dim), (data,))

    # ------------------------------------------------------------ creation

    @classmethod
    def from_dense(
        cls,
        arr,
        symmetrize: bool = False,
        check: bool = True,
        rtol: float = 1e-5,
        atol: float = None,  # dtype-aware default, see ops.symmetrize
    ) -> "FlatSymmetricTensor":
        """Compress a dense array. With `symmetrize=True` the symmetric part
        is taken; otherwise (by default) non-symmetric concrete input raises,
        mirroring the reference's validation (dense_symtensor.py:111)."""
        from ..ops.symmetrize import is_symmetric as _is_symmetric
        from ..ops.symmetrize import symmetrize as _symmetrize
        from ..utils.tables import tables

        arr = jnp.asarray(arr)
        rank, dim = arr.ndim, (arr.shape[0] if arr.ndim else 1)
        if any(s != dim for s in arr.shape):
            raise ValueError(f"dense data must be hypercubic; got {arr.shape}")
        if symmetrize:
            arr = _symmetrize(arr)
        elif check and not isinstance(arr, jax.core.Tracer):
            if not _is_symmetric(arr, rtol=rtol, atol=atol):
                raise ValueError(
                    "data is not symmetric (pass symmetrize=True to project)"
                )
        if rank == 0:
            return cls._raw(0, 1, arr.reshape(1))
        t = tables(rank, dim)
        if rank == 1:
            return cls._raw(1, dim, arr)
        rep = t.rep_np()
        ravel = np.ravel_multi_index(tuple(rep.T), arr.shape)
        gather = jnp.asarray(
            ravel.astype(np.int64 if arr.size >= 2**31 else np.int32)
        )
        return cls._raw(rank, dim, arr.reshape(-1)[gather])

    @classmethod
    def zeros(cls, rank: int, dim: int, dtype=None) -> "FlatSymmetricTensor":
        return cls(rank=rank, dim=dim, dtype=dtype)

    # ----------------------------------------------------------- structure

    @property
    def size(self) -> int:
        return self.indep_size

    @property
    def dtype(self):
        return self.data.dtype

    def astype(self, dtype) -> "FlatSymmetricTensor":
        return self._raw(self.rank, self.dim, self.data.astype(dtype))

    # ------------------------------------------------------------- content

    def todense(self) -> jnp.ndarray:
        if self.rank == 0:
            return self.data.reshape(())
        if self.rank == 1:
            return self.data
        _check_dense_size(self.rank, self.dim)
        return self.data[self.tables.dense_gather].reshape(self.shape)

    def toflat(self) -> "FlatSymmetricTensor":
        return self

    # ----------------------------------------------------------- indexing

    def class_values(self, cls) -> jnp.ndarray:
        counts = comb.as_class_counts(cls)
        if sum(counts) != self.rank:
            raise ValueError(
                f"σ-class {cls!r} has rank {sum(counts)}, tensor has rank "
                f"{self.rank}"
            )
        if self.rank == 0:
            return self.data.reshape(())
        return self.data[self.tables.class_positions(counts)]

    def _position(self, idx: Sequence[int]) -> jnp.ndarray:
        if self.rank == 0:
            return jnp.zeros((), jnp.int32)
        concrete = all(isinstance(i, (int, np.integer)) for i in idx)
        if concrete:
            srt = tuple(sorted(int(i) for i in idx))
            if any(i < 0 or i >= self.dim for i in srt):
                raise IndexError(f"index {idx} out of range for dim {self.dim}")
            if self.rank == 1:
                return jnp.asarray(srt[0], jnp.int32)
            return jnp.asarray(self.tables.layout.position(srt), jnp.int32)
        stacked = jnp.sort(jnp.stack([jnp.asarray(i) for i in idx]))
        return self.tables.position_jnp(stacked)

    def element(self, idx: Sequence[int]) -> jnp.ndarray:
        return self.data[self._position(self._canon_index(idx))]

    def _materialize_partial(self, idx: Tuple[int, ...]) -> "FlatSymmetricTensor":
        k = len(idx)
        out_rank = self.rank - k
        from ..utils.tables import tables as get_tables

        t_out = get_tables(out_rank, self.dim)
        rep_out = t_out.rep  # (n_out, out_rank) int32 — guarded
        fixed = jnp.broadcast_to(
            jnp.stack([jnp.asarray(i, jnp.int32) for i in idx]),
            (rep_out.shape[0], k),
        )
        full = jnp.sort(jnp.concatenate([fixed, rep_out], axis=1), axis=1)
        pos = self.tables.position_jnp(full)
        return FlatSymmetricTensor._raw(out_rank, self.dim, self.data[pos])

    def _partial(self, idx: Tuple[int, ...]):
        """Partial indexing returns an O(1) lazy view (reference
        FlatSymmetricTensorSlice, flat_symtensor.py:277-354); the gather
        happens on first access to packed data. Traced indices materialize
        eagerly (a view's fixed indices are static structure)."""
        if all(isinstance(i, (int, np.integer)) for i in idx):
            return FlatSymmetricTensorSlice(self, tuple(int(i) for i in idx))
        return self._materialize_partial(idx)

    # ------------------------------------------------------------ updates

    def set_class(self, cls, value) -> "FlatSymmetricTensor":
        counts = comb.as_class_counts(cls)
        value = jnp.asarray(value, dtype=self.dtype)
        if self.rank == 0:
            return self._raw(0, 1, value.reshape(1))
        pos = self.tables.class_positions(counts)
        value = jnp.broadcast_to(value, pos.shape)
        return self._raw(self.rank, self.dim, self.data.at[pos].set(value))

    def set_element(self, idx, value) -> "FlatSymmetricTensor":
        pos = self._position(self._canon_index(idx))
        return self._raw(
            self.rank,
            self.dim,
            self.data.at[pos].set(jnp.asarray(value, dtype=self.dtype)),
        )


@jax.tree_util.register_pytree_node_class
class FlatSymmetricTensorSlice(SymmetricTensor):
    """O(1) lazy view of a partial index into a FlatSymmetricTensor
    (reference FlatSymmetricTensorSlice, flat_symtensor.py:277-354).

    Holds a reference to the parent's packed leaf plus the fixed leading
    indices; no gather happens until the packed data of the sub-tensor is
    actually needed (`.data`, `toflat`, `todense`, class access).  Single
    elements are read directly through the closed-form position of
    sort(fixed ∪ idx) — O(rank) arithmetic, no table."""

    format = "flat"  # storage-compatible with flat (alignment key)

    def __init__(self, parent: FlatSymmetricTensor, fixed: Tuple[int, ...]):
        self._parent = parent
        self._fixed = tuple(fixed)
        self.rank = parent.rank - len(fixed)
        self.dim = parent.dim
        self._cache = None

    # ------------------------------------------------------------- pytree

    def tree_flatten(self):
        return (self._parent,), self._fixed

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], aux)

    @classmethod
    def _raw(cls, rank, dim, data):
        # ops that rebuild "the same format" from packed data get a plain
        # flat tensor — a slice's identity is its parent+fixed indices
        return FlatSymmetricTensor._raw(rank, dim, data)

    # ------------------------------------------------------------ content

    @property
    def parent(self) -> FlatSymmetricTensor:
        return self._parent

    @property
    def fixed(self) -> Tuple[int, ...]:
        return self._fixed

    @property
    def dtype(self):
        return self._parent.dtype

    @property
    def size(self) -> int:
        return self.indep_size

    def toflat(self) -> FlatSymmetricTensor:
        if self._cache is None:
            self._cache = self._parent._materialize_partial(self._fixed)
        return self._cache

    @property
    def data(self) -> jnp.ndarray:
        return self.toflat().data

    def todense(self) -> jnp.ndarray:
        return self.toflat().todense()

    def astype(self, dtype) -> FlatSymmetricTensor:
        return self.toflat().astype(dtype)

    # ---------------------------------------------------------- indexing

    def element(self, idx) -> jnp.ndarray:
        idx = self._canon_index(idx)
        return self._parent.element(self._fixed + tuple(idx))

    def class_values(self, cls) -> jnp.ndarray:
        return self.toflat().class_values(cls)

    def _partial(self, idx: Tuple[int, ...]):
        if all(isinstance(i, (int, np.integer)) for i in idx):
            # deepen the view — still O(1)
            return FlatSymmetricTensorSlice(
                self._parent, self._fixed + tuple(int(i) for i in idx)
            )
        return self.toflat()._partial(idx)

    # views are read-only windows; updates materialize first
    def set_class(self, cls, value) -> FlatSymmetricTensor:
        return self.toflat().set_class(cls, value)

    def set_element(self, idx, value) -> FlatSymmetricTensor:
        return self.toflat().set_element(idx, value)

    def __repr__(self):
        return (
            f"FlatSymmetricTensorSlice(rank={self.rank}, dim={self.dim}, "
            f"fixed={self._fixed}, lazy={self._cache is None})"
        )
