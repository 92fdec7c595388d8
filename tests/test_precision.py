"""Matmul-precision policy regression tests.

Background: TPU's DEFAULT matmul precision truncates f32 MXU operands to
bf16. Eager single-input contractions lower to VPU GEMVs (full f32), but
``jit(vmap(contract_all_indices_with_vector))`` turns the same dots into
MXU GEMMs — measured on v5e at rank-4 dim-20: eager rel err 1e-7 vs the
f64 oracle, vmapped up to 1e-2, before value_prec() was threaded through.

CPU executes every precision in full f32, so these tests assert the
*policy* and the *lowered HLO*, not numerics: the vmapped program must
carry operand_precision HIGHEST on its dots.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import symtensor_tpu as st
from symtensor_tpu import symalg
from symtensor_tpu.testing.utils import random_symmetric
from symtensor_tpu.utils.precision import batched_value_prec, value_prec


def _make(rank, dim, rng, dtype, fmt):
    dense = random_symmetric(rank, dim, rng=rng, dtype=np.float64)
    A = st.FlatSymmetricTensor.from_dense(np.asarray(dense, dtype=dtype))
    return A.topermcls() if fmt == "permcls" else A


def test_policy_defaults(monkeypatch):
    monkeypatch.delenv("SYMTENSOR_VALUE_PRECISION", raising=False)
    assert value_prec(jnp.float32) == jax.lax.Precision.HIGHEST
    assert value_prec(jnp.float64) == jax.lax.Precision.HIGHEST
    assert value_prec(jnp.bfloat16) is None
    assert value_prec(jnp.int32) is None


def test_batched_policy_defaults(monkeypatch):
    # explicit batched GEMMs default to HIGH (3 MXU passes): measured
    # 0.60 ms at norm err 8.8e-6 vs HIGHEST's 29.3 ms at 3.7e-7 on v5e
    # (benchmarks/batched_f32_high_probe.py)
    monkeypatch.delenv("SYMTENSOR_VALUE_PRECISION", raising=False)
    assert batched_value_prec(jnp.float32) == jax.lax.Precision.HIGH
    assert batched_value_prec(jnp.bfloat16) is None
    monkeypatch.setenv("SYMTENSOR_VALUE_PRECISION", "highest")
    assert batched_value_prec(jnp.float32) == jax.lax.Precision.HIGHEST


def test_policy_env_override(monkeypatch):
    monkeypatch.setenv("SYMTENSOR_VALUE_PRECISION", "default")
    assert value_prec(jnp.float32) is None
    monkeypatch.setenv("SYMTENSOR_VALUE_PRECISION", "high")
    assert value_prec(jnp.float32) == jax.lax.Precision.HIGH
    monkeypatch.setenv("SYMTENSOR_VALUE_PRECISION", "highest")
    assert value_prec(jnp.bfloat16) is None  # bf16 stays fast either way


def test_policy_respects_global_flag(monkeypatch):
    monkeypatch.delenv("SYMTENSOR_VALUE_PRECISION", raising=False)
    jax.config.update("jax_default_matmul_precision", "bfloat16")
    try:
        assert value_prec(jnp.float32) is None
    finally:
        jax.config.update("jax_default_matmul_precision", None)


def _assert_all_dots_highest(hlo: str):
    """Every dot in the lowered StableHLO must carry HIGHEST precision.

    lower().as_text() emits StableHLO ops like
      %5 = stablehlo.dot_general %a, %b, ..., precision = [HIGHEST, HIGHEST]
    DEFAULT-precision dots print no precision attribute.  Matching the
    op name (not legacy HLO " dot(" syntax, which never appears) and
    requiring a nonzero match count keeps this assertion from going
    vacuous if the text format shifts again."""
    dot_lines = [ln for ln in hlo.splitlines() if "dot_general" in ln]
    assert dot_lines, "no dot_general ops found in lowered program"
    for line in dot_lines:
        assert "HIGHEST" in line, line


@pytest.mark.parametrize("fmt", ["flat", "permcls"])
def test_vmapped_eval_hlo_carries_highest(fmt, rng):
    r, d = 4, 6
    A = _make(r, d, rng, jnp.float32, fmt)
    xs = jnp.asarray(rng.normal(size=(3, d)), dtype=jnp.float32)
    f = jax.jit(
        lambda xb: jax.vmap(
            lambda xi: symalg.contract_all_indices_with_vector(A, xi)
        )(xb)
    )
    _assert_all_dots_highest(f.lower(xs).as_text())


def test_batched_kernel_hlo_carries_high(rng):
    """The explicit batched kernel's dots carry HIGH (the batched policy;
    see batched_value_prec) — never DEFAULT, which would bf16-truncate."""
    from symtensor_tpu.kernels.poly_eval import poly_eval_flat_batched

    r, d = 4, 6
    A = _make(r, d, rng, jnp.float32, "flat")
    xs = jnp.asarray(rng.normal(size=(8, d)), dtype=jnp.float32)
    hlo = jax.jit(lambda xb: poly_eval_flat_batched(A, xb)).lower(xs).as_text()
    dot_lines = [ln for ln in hlo.splitlines() if "dot_general" in ln]
    assert dot_lines, "no dot_general ops found in lowered program"
    for line in dot_lines:
        assert "HIGH" in line, line  # HIGH or HIGHEST; bare dots forbidden


def test_vmapped_matches_eager(rng):
    """On CPU the numerics agree at any precision; this pins the vmapped
    path to the eager one so routing changes can't silently diverge."""
    r, d = 4, 8
    A = _make(r, d, rng, jnp.float64, "flat")
    xs = rng.normal(size=(4, d))
    eager = np.array(
        [float(symalg.contract_all_indices_with_vector(A, x)) for x in xs]
    )
    jv = np.asarray(
        jax.jit(
            lambda xb: jax.vmap(
                lambda xi: symalg.contract_all_indices_with_vector(A, xi)
            )(xb)
        )(jnp.asarray(xs))
    )
    np.testing.assert_allclose(jv, eager, rtol=1e-10)
