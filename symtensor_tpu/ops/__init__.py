"""symalg — the symmetrized algebra namespace.

Explicit ops instead of NEP-13/18 duck-array dispatch (reference
symtensor/symalg.py). `add`/`subtract`/`multiply` are callables with a
`.outer` attribute holding the *symmetrized* outer product, mirroring the
reference's UfuncWrapper instances (symalg.py:193-195). Everything is
jit/vmap/grad-compatible.
"""

from . import contract as _contract_mod
from . import elementwise as elementwise
from . import outer as _outer_mod
from .contract import (
    contract_all_indices_with_matrix,
    contract_all_indices_with_vector,
    contract_all_indices_with_vector_batched,
    contract_tensor_list,
    monomial_symmetric,
    power_sums,
)
from .elementwise import allclose, array_equal, isclose
from .outer import symmetric_outer, tensordot
from .symmetrize import is_symmetric, symmetrize


class _SymUfunc:
    """Symmetrized parallel of a NumPy binary ufunc: calling it applies the
    elementwise op; `.outer` is the symmetrized outer product (reference
    UfuncWrapper, symalg.py:101-118)."""

    def __init__(self, name: str):
        self.name = name
        self.__name__ = name

    def __call__(self, a, b):
        return elementwise.binary(self.name, a, b)

    def outer(self, a, b):
        return symmetric_outer(a, b, self.name)

    def __repr__(self):
        return f"<symmetrized ufunc '{self.name}'>"


add = _SymUfunc("add")
subtract = _SymUfunc("subtract")
multiply = _SymUfunc("multiply")


def transpose(symtensor, *axes):
    """No-op on symmetric tensors (reference symalg.py:326)."""
    return symtensor


__all__ = [
    "add",
    "subtract",
    "multiply",
    "transpose",
    "tensordot",
    "symmetric_outer",
    "contract_all_indices_with_matrix",
    "contract_all_indices_with_vector",
    "contract_all_indices_with_vector_batched",
    "contract_tensor_list",
    "monomial_symmetric",
    "power_sums",
    "elementwise",
    "allclose",
    "array_equal",
    "isclose",
    "is_symmetric",
    "symmetrize",
]
