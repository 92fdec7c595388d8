"""Gather via one-hot MXU matmuls — the TPU trick for small source tables.

The subset-identity outer product and symmetrized tensordot gather
R·n_out elements (R = #position-subsets, × #contraction-multisets for
tensordot) from value tables that are tiny (C(d+r−1, r) entries for small
operand ranks). XLA lowers such gathers to the scalar unit (~130M
elements/s measured on v5e); rebuilding each gather as one-hot matmuls
moves the work to the MXU:

- two-level selection: idx = hi·128 + lo — a narrow (H, BM) one-hot matmul
  picks each output's 128-wide source chunk, a (128, BM) lane one-hot picks
  within it;
- the output axis stays in LANES throughout (index vectors never relayout
  into sublanes, which Mosaic mis-lowers);
- MXU matmuls use precision=HIGHEST — one-pass matmuls round f32 operands
  to bf16 (measured 1e-3 errors);
- a fori_loop over rows keeps compile size independent of R.

Measured 5× faster than XLA's gathers at BASELINE config C1 sizes
(468 → 93 ms). Only profitable when the source tables fit in VMEM; callers
gate on `fits(...)`.

The op builder is memoized per shape signature: a fresh Pallas trace per
eager call costs ~0.5 s of host time, which swamped the kernel itself in
repeated-call usage (measured 549 ms/call vs the 93 ms cached-jit rate).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

_BM = 128  # output elements per block
# Per-table entry cap: one-hot selection costs ~n_src MXU MACs per gathered
# element (the (H, BM) hi-matmul).  MEASURED crossover vs XLA's gathers
# (round 5, benchmarks/gathermm_niche_tpu.py synthetic sweep, R=20,
# n_out=2M, v5e): n_src 11 480 → 5.1×, 30 856 → 3.0×, 64 824 → 1.7×
# faster; 131 072 → 0.89× (XLA wins).  Crossover ≈ 1.1e5; the cap sits
# at 98 304 = one-hot still ≥ ~1.2× ahead, covering rank-3 tables to
# dim ≈ 82 (d=72's 64 824 entries run 1.7× faster than XLA).
_MAX_SRC = 98304
_MAX_ROWS = 4096  # cap on gather rows per output element


def fits(n_a: int, n_b: int, rows: int = 1) -> bool:
    return n_a <= _MAX_SRC and n_b <= _MAX_SRC and rows <= _MAX_ROWS


def usable(a, b, rows: int = 1) -> bool:
    """Production gate: table sizes fit, operands are floating point (the
    weighted combine would truncate integer dtypes), and we are actually on
    a TPU — the interpreted kernel is far slower than XLA's gathers on
    CPU/GPU backends."""
    return (
        _on_tpu()
        and fits(a.shape[0], b.shape[0], rows)
        and jnp.issubdtype(a.dtype, jnp.floating)
        and jnp.issubdtype(b.dtype, jnp.floating)
    )


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


@lru_cache(maxsize=None)
def _build_op(n_a: int, n_b: int, R: int, n_out: int, ct_str: str,
              interpret: bool):
    """Memoized jitted gather-combine op for one shape signature.

    Index tables are ARGUMENTS (not closure constants), so one built op
    serves every table of the same shape and nothing is retraced per call.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ct = jnp.dtype(ct_str)
    grid = (-(-n_out // _BM),)
    Ha = -(-n_a // 128)
    Hb = -(-n_b // 128)

    def as2d_T(v, n):
        # (128, H): source pre-transposed so the kernel matmul is
        # standard-form (contract lhs lanes with rhs sublanes)
        H = -(-n // 128)
        pad = H * 128 - n
        if pad:
            v = jnp.concatenate([v, jnp.zeros((pad,), v.dtype)])
        return v.reshape(H, 128).T

    def kernel(a_ref, b_ref, w_ref, ia_ref, ib_ref, out_ref):
        lane_lo = jax.lax.broadcasted_iota(jnp.int32, (128, _BM), 0)

        def pick(srcT_ref, H, ids_row):
            hi = jnp.right_shift(ids_row, 7)
            lo = jnp.bitwise_and(ids_row, 127)
            oh_hi = (
                jax.lax.broadcasted_iota(jnp.int32, (H, _BM), 0) == hi
            ).astype(ct)  # (H, BM)
            rows_T = jax.lax.dot_general(
                srcT_ref[:, :], oh_hi,
                (((1,), (0,)), ((), ())),
                preferred_element_type=ct,
                precision=jax.lax.Precision.HIGHEST,
            )  # (128, BM)
            oh_lo = (lane_lo == lo).astype(ct)
            return jnp.sum(rows_T * oh_lo, axis=0, keepdims=True)  # (1, BM)

        def body(r, acc):
            va = pick(a_ref, Ha, ia_ref[pl.ds(r, 1), :])
            vb = pick(b_ref, Hb, ib_ref[pl.ds(r, 1), :])
            return acc + w_ref[r, 0].astype(ct) * va * vb

        out_ref[:, :] = jax.lax.fori_loop(
            0, R, body, jnp.zeros((1, _BM), dtype=ct)
        )

    def run(a2, b2, w2, idxA, idxB):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (128, Ha), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (128, Hb), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (R, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (R, _BM), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (R, _BM), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, _BM), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((1, n_out), ct),
            interpret=interpret,
        )(a2, b2, w2, idxA, idxB)
        return out[0]

    # Pallas kernels are not auto-differentiable: give the op the obvious
    # VJP (weighted scatter-add of the cotangent against the other operand).
    @jax.custom_vjp
    def op(av, bv, wv, idxA, idxB):
        return run(as2d_T(av, n_a), as2d_T(bv, n_b), wv, idxA, idxB)

    def fwd(av, bv, wv, idxA, idxB):
        return op(av, bv, wv, idxA, idxB), (av, bv, wv, idxA, idxB)

    def bwd(res, g):
        av, bv, wv, idxA, idxB = res
        ga = (wv * (g[None, :] * bv[idxB])).reshape(-1)
        gb = (wv * (g[None, :] * av[idxA])).reshape(-1)
        da = jax.ops.segment_sum(ga, idxA.reshape(-1), num_segments=n_a)
        db = jax.ops.segment_sum(gb, idxB.reshape(-1), num_segments=n_b)
        gw = jnp.sum(g[None, :] * av[idxA] * bv[idxB], axis=1, keepdims=True)
        return (
            da.astype(av.dtype), db.astype(bv.dtype), gw.astype(wv.dtype),
            None, None,
        )

    op.defvjp(fwd, bwd)
    return jax.jit(op)


def gather_combine(a, b, idxA, idxB, weights=None, interpret=None):
    """Σ_rows w[row] · a[idxA[row]] · b[idxB[row]], per output element.

    a: (n_a,), b: (n_b,), idxA/idxB: (R, n_out) int32, weights: (R,) or
    None (None → mean over rows). Equivalent to
    `jnp.einsum('r,ro->o', w, a[idxA] * b[idxB])` but gathering through
    the MXU.
    """
    if interpret is None:
        interpret = not _on_tpu()
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    ct = jnp.result_type(a.dtype, b.dtype)
    R, n_out = idxA.shape
    n_a, n_b = a.shape[0], b.shape[0]
    if not jnp.issubdtype(ct, jnp.floating):
        raise TypeError(
            "gather_combine needs floating-point operands (weighted combine "
            f"would truncate {ct})"
        )
    if weights is None:
        weights = jnp.full((R,), 1.0 / R, dtype=jnp.float32)
    # SMEM scalars must be 32-bit on TPU: keep weights f32, cast in-kernel.
    w2 = jnp.asarray(weights, dtype=jnp.float32).reshape(R, 1)
    op = _build_op(
        int(n_a), int(n_b), int(R), int(n_out), str(jnp.dtype(ct)),
        bool(interpret),
    )
    return op(a.astype(ct), b.astype(ct), w2, idxA, idxB)
