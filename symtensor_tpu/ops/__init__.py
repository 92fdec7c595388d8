"""symalg — the symmetrized algebra namespace.

Explicit ops instead of NEP-13/18 duck-array dispatch (reference
symtensor/symalg.py). Everything here is jit/vmap/grad-compatible.
"""

from . import elementwise
from .symmetrize import is_symmetric, symmetrize

__all__ = [
    "elementwise",
    "is_symmetric",
    "symmetrize",
]
