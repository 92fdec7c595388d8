"""Experimental sparse-backed packed storage.

The reference's FlatSymmetricTensor accepts dense *or scipy.sparse* 1-D
data and can flip between them with change_array_type
(/root/reference/symtensor/flat_symtensor.py:80,87-110,195-200).  The JAX
analog is a BCOO leaf over the packed independent-component axis: useful
when only a small fraction of index classes carry values (e.g. few-body
interaction tensors at large d, where even C(d+r−1, r) is too much to
materialize densely).

Ops closed on sparse storage run sparse (scalar scale, negation, sparse+
sparse addition, polynomial evaluation in O(nnz·r)); everything else goes
through `toflat()` with a once-per-site storage-densify warning.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import sparse as jsparse

from ..utils import combinatorics as comb
from .base import SymmetricTensor, default_dtype
from .flat import FlatSymmetricTensor


@jax.tree_util.register_pytree_node_class
class SparseFlatSymmetricTensor(SymmetricTensor):
    """Leaves: the BCOO values/positions plus, per stored entry, its
    representative multiset `rep` (nnz, r) and multiplicity γ (nnz,) —
    carried so contractions run in O(nnz·r) without any table over the
    full packed axis.  Duplicate positions are allowed and mean summation
    (BCOO semantics), which keeps sparse+sparse addition allocation-only."""

    format = "sparse_flat"

    def __init__(self, rank, dim, bcoo: jsparse.BCOO, rep, gamma):
        n = comb.indep_size(rank, dim)
        if bcoo.shape != (n,):
            raise ValueError(
                f"sparse leaf must have shape ({n},) for rank {rank} "
                f"dim {dim}; got {bcoo.shape}"
            )
        self.rank = int(rank)
        self.dim = int(dim)
        self.bcoo = bcoo
        self.rep = rep  # (nnz, rank) int32
        self.gamma = gamma  # (nnz,) float32

    # ------------------------------------------------------------- pytree

    def tree_flatten(self):
        return (self.bcoo, self.rep, self.gamma), (self.rank, self.dim)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj.rank, obj.dim = aux
        obj.bcoo, obj.rep, obj.gamma = leaves
        return obj

    # ----------------------------------------------------------- creation

    @classmethod
    def from_flat(
        cls, flat: FlatSymmetricTensor, threshold: float = 0.0
    ) -> "SparseFlatSymmetricTensor":
        """Sparsify packed storage, dropping |v| <= threshold
        (reference change_array_type dense→sparse, flat_symtensor.py:195)."""
        from ..utils.tables import tables

        mask = np.abs(np.asarray(flat.data)) > threshold
        (idx,) = np.nonzero(mask)
        vals = flat.data[jnp.asarray(idx)]
        bcoo = jsparse.BCOO(
            (vals, jnp.asarray(idx)[:, None]), shape=(flat.data.shape[0],)
        )
        if flat.rank == 0:
            rep = jnp.zeros((len(idx), 0), jnp.int32)
            gamma = jnp.ones((len(idx),), jnp.float32)
        else:
            t = tables(flat.rank, flat.dim)
            rows = t.rep_np()[idx]
            rep = jnp.asarray(rows.astype(np.int32))
            gamma = jnp.asarray(
                comb.row_multiplicities(rows).astype(np.float32)
            )
        return cls(flat.rank, flat.dim, bcoo, rep, gamma)

    @classmethod
    def from_entries(
        cls,
        rank: int,
        dim: int,
        indices: Sequence[Sequence[int]],
        values,
        dtype=None,
    ) -> "SparseFlatSymmetricTensor":
        """Build directly from (multi-index, value) pairs without ever
        materializing the packed axis — the construction path for tensors
        whose C(d+r−1, r) itself is huge."""
        rows = np.sort(np.asarray(indices, dtype=np.int64), axis=1)
        if rows.ndim != 2 or rows.shape[1] != rank:
            raise ValueError(
                f"indices must be (nnz, {rank}); got {rows.shape}"
            )
        if rows.size and (rows.min() < 0 or rows.max() >= dim):
            raise IndexError("entry index out of range")
        if rank == 1:
            pos = rows[:, 0]
        else:
            pos = comb.gflat_layout(rank, dim).position_array(rows)
        vals = jnp.asarray(values, dtype=dtype or default_dtype())
        bcoo = jsparse.BCOO(
            (vals, jnp.asarray(pos)[:, None]),
            shape=(comb.indep_size(rank, dim),),
        )
        rep = jnp.asarray(rows.astype(np.int32))
        gamma = jnp.asarray(comb.row_multiplicities(rows).astype(np.float32))
        return cls(rank, dim, bcoo, rep, gamma)

    # ---------------------------------------------------------- structure

    @property
    def dtype(self):
        return self.bcoo.data.dtype

    def keys(self):
        """Storage-leaf names (sparse storage has no σ-class layout)."""
        return dict.fromkeys(["values", "indices"]).keys()

    def values(self):
        return iter([self.bcoo.data, self.bcoo.indices])

    @property
    def nnz(self) -> int:
        return int(self.bcoo.nse)

    @property
    def size(self) -> int:
        return self.nnz

    def astype(self, dtype) -> "SparseFlatSymmetricTensor":
        bcoo = jsparse.BCOO(
            (self.bcoo.data.astype(dtype), self.bcoo.indices),
            shape=self.bcoo.shape,
        )
        return SparseFlatSymmetricTensor(
            self.rank, self.dim, bcoo, self.rep, self.gamma
        )

    # ------------------------------------------------------------ content

    def toflat(self) -> FlatSymmetricTensor:
        from ..utils.profiling import count_fallback

        count_fallback(
            "sparse_flat.densify_storage",
            "(op not closed on sparse storage)",
        )
        return FlatSymmetricTensor._raw(
            self.rank, self.dim, self.bcoo.todense()
        )

    def todense(self) -> jnp.ndarray:
        return self.toflat().todense()

    # ----------------------------------------------------------- indexing

    def element(self, idx) -> jnp.ndarray:
        idx = self._canon_index(idx)
        if self.rank == 0:
            return self.bcoo.todense().reshape(())
        from ..utils.tables import tables

        t = tables(self.rank, self.dim)
        if all(isinstance(i, (int, np.integer)) for i in idx):
            srt = tuple(sorted(int(i) for i in idx))
            pos = srt[0] if self.rank == 1 else int(t.layout.position(srt))
        else:
            pos = t.position_jnp(
                jnp.sort(jnp.stack([jnp.asarray(i) for i in idx]))
            )
        # closed-form position, then an O(nnz) masked reduction — absent
        # entries read as zero
        hit = (self.bcoo.indices[:, 0] == pos).astype(self.dtype)
        return jnp.dot(hit, self.bcoo.data)

    def class_values(self, cls) -> jnp.ndarray:
        return self.toflat().class_values(cls)

    def _partial(self, idx):
        return self.toflat()._partial(idx)

    def set_element(self, idx, value):
        return self.toflat().set_element(idx, value)

    def set_class(self, cls, value):
        return self.toflat().set_class(cls, value)

    # --------------------------------------------------- sparse-closed ops

    def scale(self, s) -> "SparseFlatSymmetricTensor":
        bcoo = jsparse.BCOO(
            (self.bcoo.data * jnp.asarray(s, self.dtype), self.bcoo.indices),
            shape=self.bcoo.shape,
        )
        return SparseFlatSymmetricTensor(
            self.rank, self.dim, bcoo, self.rep, self.gamma
        )

    def __neg__(self):
        return self.scale(-1.0)

    def add_sparse(
        self, other: "SparseFlatSymmetricTensor"
    ) -> "SparseFlatSymmetricTensor":
        """Allocation-only sparse+sparse: concatenate entries (duplicate
        positions mean summation under BCOO semantics, and every consumer
        here is additive over entries)."""
        if (self.rank, self.dim) != (other.rank, other.dim):
            raise ValueError("rank/dim mismatch")
        vals = jnp.concatenate([self.bcoo.data, other.bcoo.data])
        idx = jnp.concatenate([self.bcoo.indices, other.bcoo.indices])
        bcoo = jsparse.BCOO((vals, idx), shape=self.bcoo.shape)
        return SparseFlatSymmetricTensor(
            self.rank,
            self.dim,
            bcoo,
            jnp.concatenate([self.rep, other.rep]),
            jnp.concatenate([self.gamma, other.gamma]),
        )

    def contract_all_indices_with_vector(self, x) -> jnp.ndarray:
        """Σ A·x⊗…⊗x in O(nnz·r): each stored component contributes
        γ_I · v_I · ∏_k x[rep_I[k]] (the defining sum restricted to the
        support — no tables over the full packed axis)."""
        x = jnp.asarray(x)
        if self.rank == 0:
            return self.bcoo.todense().reshape(())
        mono = x[self.rep[:, 0]]
        for k in range(1, self.rank):
            mono = mono * x[self.rep[:, k]]
        gam = self.gamma.astype(x.dtype)
        return jnp.dot(self.bcoo.data.astype(x.dtype) * gam, mono)

    def memory_footprint(self) -> int:
        return (
            self.bcoo.data.size * self.bcoo.data.dtype.itemsize
            + self.bcoo.indices.size * self.bcoo.indices.dtype.itemsize
        )

    def __repr__(self):
        return (
            f"SparseFlatSymmetricTensor(rank={self.rank}, dim={self.dim}, "
            f"nnz={self.nnz}, dtype={self.dtype})"
        )
