"""Matmul precision policy for value-path dots.

TPU's DEFAULT matmul precision truncates f32 operands to bf16 on the MXU
(~1e-3 relative error per pass). Single-input evaluation lowers to GEMVs,
which execute on the VPU in full f32 regardless — but under ``vmap`` or
explicit batching the very same ``dot_general`` becomes an MXU GEMM and
silently loses ~3 digits (measured: ``jit(vmap(contract_all_indices_with_
vector))`` at rank-4 dim-20 hit 1e-2 relative error vs the f64 oracle while
the eager path sat at 1e-7).

Policy implemented by :func:`value_prec` — keyed on the dtype the dot's
operands actually have at the MXU:

- bf16 operands: ``None`` (the operands are already bf16; DEFAULT is both
  exact-given-the-inputs and fastest — accumulation stays f32 via
  ``preferred_element_type``).
- f32/f64 operands: ``HIGHEST``, unless the user has set the global
  ``jax_default_matmul_precision`` flag (then we respect their choice and
  pass ``None``).
- ``SYMTENSOR_VALUE_PRECISION`` ∈ {default, high, highest} overrides
  everything (measurement/escape hatch).

The reference implicitly computes everything at full NumPy f32/f64
precision (`/root/reference/symtensor/symalg.py` is plain NumPy); matching
its accuracy by default is part of parity. Users who want bf16 MXU speed
opt in by *storing* bf16 (the premul-views batched route) or via the env
knob / global flag.

.. caution:: **The policy is read at TRACE time and then baked into cached
   programs.** Callers are ``lru_cache``'d jitted builders keyed only on
   shape-ish arguments (rank, dim, dtype), so flipping
   ``SYMTENSOR_VALUE_PRECISION`` or entering ``jax.default_matmul_precision``
   *after* an op has already traced is silently ignored for that op — the
   cached executable keeps whatever precision it was traced with.  Set the
   env var before first use of an op (benchmarks/precision_probe.py calls
   ``cache_clear()`` on the builders between settings for exactly this
   reason).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_ENV_MAP = {
    "default": None,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def value_prec(operand_dtype):
    """Precision for a dot whose operands have ``operand_dtype``."""
    dt = jnp.dtype(operand_dtype)
    if dt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)):
        return None
    env = os.environ.get("SYMTENSOR_VALUE_PRECISION", "").lower()
    if env in _ENV_MAP:
        return _ENV_MAP[env]
    if jax.config.jax_default_matmul_precision is not None:
        return None  # respect the user's global choice
    return jax.lax.Precision.HIGHEST


def batched_value_prec(operand_dtype):
    """Precision for the EXPLICIT batched-evaluation GEMMs: HIGH (3 MXU
    passes — the hardware's own Ah·Bh + Ah·Bl + Al·Bh split) instead of
    HIGHEST (6 passes).

    Measured same-process on v5e (rank-4 dim-100, B = 1024,
    ``benchmarks/batched_f32_high_probe.py``, 2026-08-20): HIGH 0.60 ms at
    normalized error 8.8e-6 vs the f64 oracle, HIGHEST 29.3 ms at 3.7e-7,
    DEFAULT 0.45 ms at 2.1e-3, true-bf16 storage 0.54 ms at 2.0e-3.  HIGH
    matches bf16 throughput with ~230× better accuracy; HIGHEST's 6-pass
    lowering is pathologically slow on wide-batch GEMMs.

    Scope: only ``poly_eval_flat_batched*`` uses this.  ``vmap`` of the
    single-input op still carries HIGHEST (value_prec — the policy is read
    at trace time, where the scalar path cannot know it is being vmapped),
    as does everything else.  The same SYMTENSOR_VALUE_PRECISION /
    jax_default_matmul_precision overrides apply."""
    dt = jnp.dtype(operand_dtype)
    if dt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)):
        return None
    env = os.environ.get("SYMTENSOR_VALUE_PRECISION", "").lower()
    if env in _ENV_MAP:
        return _ENV_MAP[env]
    if jax.config.jax_default_matmul_precision is not None:
        return None  # respect the user's global choice
    return jax.lax.Precision.HIGH
