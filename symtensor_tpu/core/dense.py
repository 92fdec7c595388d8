"""DenseSymmetricTensor — full d^r storage, the reference implementation.

Mirrors the role of the reference's ``DenseSymmetricTensor``
(symtensor/dense_symtensor.py:99): symmetry enforced at construction, used
as the oracle format in tests. Class/element updates round-trip through the
packed representation (dense tensors are small by construction — guarded by
config.max_dense_elements — so the O(d^r) gather is fine and keeps one code
path).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import combinatorics as comb
from .base import SymmetricTensor, _check_dense_size, default_dtype
from .flat import FlatSymmetricTensor


@jax.tree_util.register_pytree_node_class
class DenseSymmetricTensor(SymmetricTensor):
    format = "dense"

    def __init__(
        self,
        rank: Optional[int] = None,
        dim: Optional[int] = None,
        data=None,
        dtype=None,
        symmetrize: bool = False,
        check: bool = True,
    ):
        if data is None:
            if rank is None or dim is None:
                raise ValueError("need rank and dim when no data is given")
            _check_dense_size(rank, dim, "DenseSymmetricTensor")
            data = jnp.zeros((dim,) * rank, dtype=dtype or default_dtype())
        else:
            from ..ops.symmetrize import is_symmetric as _is_symmetric
            from ..ops.symmetrize import symmetrize as _symmetrize

            data = jnp.asarray(data, dtype=dtype)
            if rank is not None and data.ndim != rank:
                raise ValueError(f"data rank {data.ndim} != rank {rank}")
            if data.ndim and any(s != data.shape[0] for s in data.shape):
                raise ValueError(f"data must be hypercubic; got {data.shape}")
            if dim is not None and data.ndim and data.shape[0] != dim:
                raise ValueError(f"data dim {data.shape[0]} != dim {dim}")
            if symmetrize:
                data = _symmetrize(data)
            elif check and not isinstance(data, jax.core.Tracer):
                if not _is_symmetric(data):
                    raise ValueError(
                        "data is not symmetric "
                        "(pass symmetrize=True to project)"
                    )
        self.rank = int(data.ndim)
        self.dim = int(data.shape[0]) if data.ndim else int(dim or 1)
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
    def _raw(cls, rank: int, dim: int, data) -> "DenseSymmetricTensor":
        return cls.tree_unflatten((rank, dim), (data,))

    @classmethod
    def from_dense(cls, arr, symmetrize=False, check=True) -> "DenseSymmetricTensor":
        return cls(data=arr, symmetrize=symmetrize, check=check)

    @classmethod
    def zeros(cls, rank: int, dim: int, dtype=None) -> "DenseSymmetricTensor":
        return cls(rank=rank, dim=dim, dtype=dtype)

    # ----------------------------------------------------------- structure

    @property
    def size(self) -> int:
        return self.dense_size

    @property
    def dtype(self):
        return self.data.dtype

    def astype(self, dtype) -> "DenseSymmetricTensor":
        return self._raw(self.rank, self.dim, self.data.astype(dtype))

    # ------------------------------------------------------------- content

    def todense(self) -> jnp.ndarray:
        return self.data

    def toflat(self) -> FlatSymmetricTensor:
        return FlatSymmetricTensor.from_dense(self.data, check=False)

    @property
    def flat(self):
        """Native C-order view — dense storage matches NumPy's ``flat``
        exactly (reference dense_symtensor.py:266)."""
        return iter(np.asarray(self.data).reshape(-1))

    @property
    def flat_index(self):
        shape = self.shape
        return (
            tuple(int(v) for v in np.unravel_index(i, shape))
            for i in range(self.dense_size)
        )

    # ----------------------------------------------------------- indexing

    def class_values(self, cls) -> jnp.ndarray:
        return self.toflat().class_values(cls)

    def element(self, idx: Sequence[int]) -> jnp.ndarray:
        return self.data[self._canon_index(idx)]

    def _partial(self, idx: Tuple[int, ...]) -> "DenseSymmetricTensor":
        return DenseSymmetricTensor._raw(
            self.rank - len(idx), self.dim, self.data[tuple(idx)]
        )

    # ------------------------------------------------------------ updates
    # Round-trip through the packed form: updates there hit the whole index
    # class by construction, matching reference __setitem__ semantics
    # (dense_symtensor.py:201-241).

    def _via_flat(self, fn) -> "DenseSymmetricTensor":
        flat = fn(self.toflat())
        return DenseSymmetricTensor._raw(self.rank, self.dim, flat.todense())

    def set_class(self, cls, value) -> "DenseSymmetricTensor":
        return self._via_flat(lambda f: f.set_class(cls, value))

    def set_element(self, idx, value) -> "DenseSymmetricTensor":
        return self._via_flat(lambda f: f.set_element(idx, value))
