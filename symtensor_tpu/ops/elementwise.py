"""Elementwise algebra on symmetric tensors.

Elementwise ops map independent components to independent components, so on
packed storage they are single fused array ops — the "aligned fast path" of
the reference's ufunc dispatcher (base.py:1326-1355) with no slow σ-class
fallback ever needed.

Format promotion: when operands differ, the denser operand is converted to
the more compressed format and the result keeps that format
(dense < permcls < flat in promotion priority; Decomp converts to flat
first — its lazy-symmetrized structure is not closed under elementwise ops).
This replaces the reference's `result_array` superclass promotion
(base.py:1757) with an explicit rule suited to immutable conversions.
"""

from __future__ import annotations

import numbers
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..core.base import SymmetricTensor

_FNS = {
    "add": jnp.add,
    "subtract": jnp.subtract,
    "multiply": jnp.multiply,
    "divide": jnp.divide,
    "power": jnp.power,
}

_PRIORITY = {"dense": 0, "permcls": 1, "flat": 2}


def _is_scalar(x) -> bool:
    if isinstance(x, numbers.Number):
        return True
    if isinstance(x, (np.ndarray, jnp.ndarray)) and getattr(x, "ndim", None) == 0:
        return True
    return False


def _promote(a: SymmetricTensor, b: SymmetricTensor):
    """Bring both operands to a common format; return (a, b)."""
    from ..utils.profiling import count_fallback

    if a.format in ("decomp", "sparse_flat"):
        count_fallback("elementwise.decomp_to_flat", "(operand expanded)")
        a = a.toflat()
    if b.format in ("decomp", "sparse_flat"):
        count_fallback("elementwise.decomp_to_flat", "(operand expanded)")
        b = b.toflat()
    if a.format == b.format:
        return a, b
    target = max(a.format, b.format, key=lambda f: _PRIORITY[f])
    conv = {"flat": lambda t: t.toflat(), "permcls": lambda t: t.topermcls()}[
        target
    ]
    return conv(a), conv(b)


def _map_leaves(t: SymmetricTensor, fn: Callable):
    """Apply an elementwise fn to the value leaves of one tensor, keeping
    its format. Valid because each dense element equals its representative's
    stored value, so leafwise == dense-elementwise."""
    if t.format in ("dense", "flat"):
        return type(t)._raw(t.rank, t.dim, fn(t.data))
    if t.format == "permcls":
        return type(t)._raw(
            t.rank, t.dim, {k: fn(v) for k, v in t.data.items()}
        )
    if t.format in ("decomp", "sparse_flat"):
        return _map_leaves(t.toflat(), fn)
    raise TypeError(f"unknown format {t.format!r}")


def _zip_leaves(a: SymmetricTensor, b: SymmetricTensor, fn: Callable):
    assert a.format == b.format
    if a.format in ("dense", "flat"):
        return type(a)._raw(a.rank, a.dim, fn(a.data, b.data))
    if a.format == "permcls":
        # 0-d (scalar-compressed) leaves broadcast naturally against vectors.
        return type(a)._raw(
            a.rank,
            a.dim,
            {k: fn(a.data[k], b.data[k]) for k in a.data},
        )
    raise TypeError(f"unknown format {a.format!r}")


def unary(fn: Callable, t: SymmetricTensor) -> SymmetricTensor:
    return _map_leaves(t, fn)


def binary(op_name: str, a, b, reverse: bool = False):
    fn = _FNS[op_name]
    if reverse:
        a, b = b, a
    a_sym = isinstance(a, SymmetricTensor)
    b_sym = isinstance(b, SymmetricTensor)

    # Decomp stays decomposed for the ops its structure supports exactly:
    # ±decomp, scalar scaling, and scalar shifts (c·1⃗^⊗r is itself decomp).
    decomp_result = _try_decomp_binary(op_name, a, b, a_sym, b_sym)
    if decomp_result is not NotImplemented:
        return decomp_result

    # Sparse storage stays sparse under scaling and sparse+sparse addition.
    sparse_result = _try_sparse_binary(op_name, a, b, a_sym, b_sym)
    if sparse_result is not NotImplemented:
        return sparse_result

    if a_sym and b_sym:
        # rank-0 operands broadcast as scalars (format-agnostic: permcls
        # stores a dict and decomp has no .data, so go through toflat).
        if a.rank == 0 and b.rank != 0:
            return binary(op_name, a.toflat().data.reshape(()), b)
        if b.rank == 0 and a.rank != 0:
            return binary(op_name, a, b.toflat().data.reshape(()))
        if (a.rank, a.dim) != (b.rank, b.dim):
            raise ValueError(
                f"shape mismatch: rank/dim ({a.rank},{a.dim}) vs "
                f"({b.rank},{b.dim})"
            )
        a, b = _promote(a, b)
        return _zip_leaves(a, b, fn)

    if a_sym and _is_scalar(b):
        s = jnp.asarray(b)
        return _map_leaves(a, lambda x: fn(x, s))
    if b_sym and _is_scalar(a):
        s = jnp.asarray(a)
        return _map_leaves(b, lambda x: fn(s, x))

    other = a if not a_sym else b
    raise TypeError(
        f"cannot apply '{op_name}' between a SymmetricTensor and "
        f"{type(other).__name__}; wrap array operands with from_dense() "
        "(only scalars broadcast implicitly)"
    )


def _try_decomp_binary(op_name, a, b, a_sym, b_sym):
    """Structure-preserving decomp arithmetic; NotImplemented → generic path."""
    from ..core.decomp import DecompSymmetricTensor as D

    a_dec = a_sym and a.format == "decomp"
    b_dec = b_sym and b.format == "decomp"
    if not (a_dec or b_dec):
        return NotImplemented
    if a_dec and b_dec and op_name in ("add", "subtract"):
        other = b.scale(-1.0) if op_name == "subtract" else b
        return a.add_decomp(other)
    if a_dec and _is_scalar(b):
        if op_name in ("add", "subtract") and a.rank == 0:
            return NotImplemented
        if op_name == "multiply":
            return a.scale(b)
        if op_name == "divide":
            return a.scale(1.0 / jnp.asarray(b))
        if op_name in ("add", "subtract"):
            s = jnp.asarray(b) * (-1.0 if op_name == "subtract" else 1.0)
            ones = D.from_vector(
                jnp.ones((a.dim,), dtype=a.dtype), a.rank
            ).scale(s)
            return a.add_decomp(ones)
    if b_dec and _is_scalar(a):
        if op_name in ("add", "subtract") and b.rank == 0:
            return NotImplemented
        if op_name == "multiply":
            return b.scale(a)
        if op_name == "add":
            ones = D.from_vector(
                jnp.ones((b.dim,), dtype=b.dtype), b.rank
            ).scale(jnp.asarray(a))
            return b.add_decomp(ones)
        if op_name == "subtract":  # a − B
            ones = D.from_vector(
                jnp.ones((b.dim,), dtype=b.dtype), b.rank
            ).scale(jnp.asarray(a))
            return ones.add_decomp(b.scale(-1.0))
    return NotImplemented


def _try_sparse_binary(op_name, a, b, a_sym, b_sym):
    """Structure-preserving sparse arithmetic; NotImplemented → generic."""
    a_sp = a_sym and a.format == "sparse_flat"
    b_sp = b_sym and b.format == "sparse_flat"
    if not (a_sp or b_sp):
        return NotImplemented
    if a_sp and b_sp and op_name in ("add", "subtract"):
        other = b.scale(-1.0) if op_name == "subtract" else b
        return a.add_sparse(other)
    if a_sp and _is_scalar(b):
        if op_name == "multiply":
            return a.scale(b)
        if op_name == "divide":
            return a.scale(1.0 / jnp.asarray(b))
    if b_sp and _is_scalar(a) and op_name == "multiply":
        return b.scale(a)
    return NotImplemented


# ---------------------------------------------------------------- compare


def allclose(a, b, rtol=1e-5, atol=1e-8, equal_nan=False) -> bool:
    """Elementwise closeness over independent components. Equivalent to a
    dense allclose because every dense element equals some stored component
    (reference np.allclose impl, base.py:1623)."""
    if isinstance(a, SymmetricTensor) and isinstance(b, SymmetricTensor):
        if (a.rank, a.dim) != (b.rank, b.dim):
            return False
        return bool(
            jnp.allclose(a.toflat().data, b.toflat().data, rtol=rtol,
                         atol=atol, equal_nan=equal_nan)
        )
    if isinstance(a, SymmetricTensor) and _is_scalar(b):
        return bool(jnp.allclose(a.toflat().data, b, rtol=rtol, atol=atol,
                                 equal_nan=equal_nan))
    if isinstance(b, SymmetricTensor) and _is_scalar(a):
        return bool(jnp.allclose(a, b.toflat().data, rtol=rtol, atol=atol,
                                 equal_nan=equal_nan))
    raise TypeError("allclose needs SymmetricTensor or scalar operands")


def isclose(a, b, rtol=1e-5, atol=1e-8, equal_nan=False):
    """Elementwise isclose over independent components, returned as a
    boolean tensor in the promoted format (reference np.isclose impl,
    base.py:1520)."""
    if isinstance(a, SymmetricTensor) and isinstance(b, SymmetricTensor):
        if (a.rank, a.dim) != (b.rank, b.dim):
            raise ValueError("rank/dim mismatch")
        a, b = _promote(a, b)
        return _zip_leaves(
            a, b, lambda u, v: jnp.isclose(u, v, rtol=rtol, atol=atol,
                                           equal_nan=equal_nan)
        )
    if isinstance(a, SymmetricTensor) and _is_scalar(b):
        s = jnp.asarray(b)
        return _map_leaves(a, lambda u: jnp.isclose(u, s, rtol=rtol,
                                                    atol=atol,
                                                    equal_nan=equal_nan))
    if isinstance(b, SymmetricTensor) and _is_scalar(a):
        s = jnp.asarray(a)
        return _map_leaves(b, lambda v: jnp.isclose(s, v, rtol=rtol,
                                                    atol=atol,
                                                    equal_nan=equal_nan))
    raise TypeError("isclose needs SymmetricTensor or scalar operands")


def array_equal(a, b) -> bool:
    if isinstance(a, SymmetricTensor) and isinstance(b, SymmetricTensor):
        if (a.rank, a.dim) != (b.rank, b.dim):
            return False
        return bool(jnp.array_equal(a.toflat().data, b.toflat().data))
    raise TypeError("array_equal needs SymmetricTensor operands")
