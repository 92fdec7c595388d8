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


def apply(fn, symtensor):
    """Apply any elementwise `()->()` function over independent components,
    keeping the storage format (reference default_unary_ufunc,
    base.py:1145-1192, which handles arbitrary NumPy ufuncs).

    Valid for any elementwise fn because every dense element equals its
    representative's stored value. Decomp operands are expanded to flat
    first (their multiplicative structure is not closed under nonlinear
    maps)."""
    return elementwise.unary(fn, symtensor)


def _named_unary(name, jnp_fn):
    def op(symtensor):
        return elementwise.unary(jnp_fn, symtensor)

    op.__name__ = name
    op.__qualname__ = name
    op.__doc__ = (
        f"Elementwise {name} over independent components "
        f"(reference np.{name} via default_unary_ufunc, base.py:1145). "
        "Equivalent to symalg.apply(jnp.%s, A)." % name
    )
    return op


import jax.numpy as _jnp  # noqa: E402

exp = _named_unary("exp", _jnp.exp)
expm1 = _named_unary("expm1", _jnp.expm1)
log = _named_unary("log", _jnp.log)
log1p = _named_unary("log1p", _jnp.log1p)
sqrt = _named_unary("sqrt", _jnp.sqrt)
square = _named_unary("square", _jnp.square)
reciprocal = _named_unary("reciprocal", _jnp.reciprocal)
negative = _named_unary("negative", _jnp.negative)
absolute = _named_unary("absolute", _jnp.abs)
abs = absolute
sign = _named_unary("sign", _jnp.sign)
sin = _named_unary("sin", _jnp.sin)
cos = _named_unary("cos", _jnp.cos)
tanh = _named_unary("tanh", _jnp.tanh)


__all__ = [
    "add",
    "subtract",
    "multiply",
    "transpose",
    "apply",
    "exp",
    "expm1",
    "log",
    "log1p",
    "sqrt",
    "square",
    "reciprocal",
    "negative",
    "absolute",
    "abs",
    "sign",
    "sin",
    "cos",
    "tanh",
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
