from . import polynomial

__all__ = ["polynomial"]
