"""Pallas TPU kernel for the grouped polynomial-evaluation pass.

Fuses the three per-group reductions (full GEMV, leading-row GEMV, first
column) into a single read of each value block:

    out[0, p] = Σ_t V[p, t]·tri[t]          (u_full)
    out[1, p] = Σ_{t<row_len} V[p, t]·tri[t] (u_row — tails touching j)
    out[2, p] = V[p, 0]·tri[0]               (u_cell — the (j,j) tail)

One pallas_call per j-group; grid tiles the head dimension. The epilogue
(per-head coefficients, dot with EGF head monomials) stays in jnp. On
non-TPU backends the kernel runs in interpreter mode (tests) or the caller
falls back to the pure-jnp path.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..core.flat import FlatSymmetricTensor
from .poly_eval import (
    _grouped_static,
    _head_weights,
    group_views,
)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _group_pass(V: jnp.ndarray, tri_j: jnp.ndarray, row_len: int,
                interpret: bool) -> jnp.ndarray:
    """(3, P_j) fused reductions for one group."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, T = V.shape
    # Mosaic requires the block's lane dim to be a multiple of 128 or span
    # the array. Budget ~1.5 MB per block: Mosaic double-buffers the input
    # window and materializes the elementwise product on the VMEM stack, so
    # the true footprint is ~3-4x the block size (observed 17 MB scoped-vmem
    # OOM with 6 MB blocks).
    budget = int(1.5 * 1024 * 1024)
    if P * T * 4 <= budget:
        PB = P
    else:
        PB = max(128, (budget // (4 * T)) // 128 * 128)
    grid = (-(-P // PB),)

    def kernel(tri_ref, v_ref, out_ref):
        prod = v_ref[:, :] * tri_ref[0, :][None, :]
        out_ref[0, :] = jnp.sum(prod, axis=1)
        # row_len is static per group: a static slice, no mask temp
        out_ref[1, :] = jnp.sum(prod[:, :row_len], axis=1)
        out_ref[2, :] = prod[:, 0]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, PB), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, P), V.dtype),
        interpret=interpret,
    )(tri_j.reshape(1, T), V)


@lru_cache(maxsize=None)
def _pallas_eval_jitted(rank: int, dim: int, interpret: bool):
    from ..utils.tables import tables as get_tables

    P, T, goff, toff = _grouped_static(rank, dim)

    def f(views, x):
        t = get_tables(rank, dim)
        x = jnp.asarray(x)
        ct = views[0].dtype
        x = x.astype(ct)
        ta, tb = t.tri_pairs
        tri = x[ta] * x[tb]
        tri = tri * (1.0 - 0.5 * (ta == tb).astype(ct))
        M, maxel, maxrun = _head_weights(t, x, rank)
        total = jnp.zeros((), dtype=ct)
        for j in range(dim):
            Tj = T[j]
            Pj = P[j]
            tri_j = jax.lax.slice(tri, (toff[j],), (toff[j] + Tj,))
            V = views[j]
            if V.shape == (Tj, Pj) and Tj != Pj:
                # narrow-tail transposed view: jnp math (tiny groups)
                rl = dim - j
                u = jnp.stack(
                    [tri_j @ V, tri_j[:rl] @ V[:rl], V[0] * tri_j[0]]
                )
            else:
                u = _group_pass(V, tri_j, dim - j, interpret)
            q = jnp.where(maxel[:Pj] == j, maxrun[:Pj], 0).astype(ct)
            c1 = x[j] / (q + 1)
            c2 = c1 * (1.0 / (q + 2) - 1.0)
            c3 = c1 * (2.0 / ((q + 2) * (q + 3)) - 1.0 / (q + 2))
            total = total + jnp.dot(
                M[:Pj], c1 * u[0] + c2 * u[1] + c3 * u[2]
            )
        return float(math.factorial(rank)) * total

    return jax.jit(f)


def poly_eval_flat_pallas(A: FlatSymmetricTensor, x, interpret=None):
    """Pallas-fused repeated-evaluation path. `interpret=None` auto-selects
    interpreter mode off-TPU (for testing)."""
    if A.rank < 3:
        from .poly_eval import poly_eval_flat

        return poly_eval_flat(A, x)
    if interpret is None:
        interpret = not _on_tpu()
    views = group_views(A)
    return _pallas_eval_jitted(A.rank, A.dim, bool(interpret))(views, x)
