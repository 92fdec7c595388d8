from .base import SymmetricTensor
from .decomp import DecompSymmetricTensor
from .dense import DenseSymmetricTensor
from .flat import FlatSymmetricTensor
from .permcls import PermClsSymmetricTensor

__all__ = [
    "SymmetricTensor",
    "DecompSymmetricTensor",
    "DenseSymmetricTensor",
    "FlatSymmetricTensor",
    "PermClsSymmetricTensor",
]
