from .base import SymmetricTensor
from .dense import DenseSymmetricTensor
from .flat import FlatSymmetricTensor
from .permcls import PermClsSymmetricTensor

__all__ = [
    "SymmetricTensor",
    "DenseSymmetricTensor",
    "FlatSymmetricTensor",
    "PermClsSymmetricTensor",
]
