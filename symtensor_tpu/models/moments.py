"""Moment hierarchies — the field-theory workload around
`contract_tensor_list` (BASELINE config 4).

Symmetric moment tensors m_r = E[x^⊗r] of a Gaussian are built *exactly* in
the decomposed (CP) format via the Isserlis recursion

    m_r = sym(μ ⊗ m_{r-1}) + (r−1)·sym(Σ ⊗ m_{r-2})

using only structural decomp ops (outer, scale, add) — no dense tensor is
ever formed, so the hierarchy scales to large dimension. Expectations of
symmetric polynomials follow by full contraction ⟨A_r, m_r⟩.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from ..core.decomp import DecompSymmetricTensor
from ..ops import contract_tensor_list, tensordot


def gaussian_moments(
    mean, cov, max_rank: int
) -> List[DecompSymmetricTensor]:
    """[m_1, …, m_max_rank] as decomp tensors (exact, Isserlis)."""
    mean = jnp.asarray(mean)
    cov = jnp.asarray(cov)
    d = mean.shape[0]
    if cov.shape != (d, d):
        raise ValueError("cov must be (d, d)")
    m1 = DecompSymmetricTensor.from_vector(mean, 1)
    cov_t = DecompSymmetricTensor.from_matrix(cov)
    out = [m1]
    if max_rank >= 2:
        m2 = cov_t.add_decomp(DecompSymmetricTensor.from_vector(mean, 2))
        out.append(m2)
    for r in range(3, max_rank + 1):
        term1 = m1.outer_decomp(out[r - 2])  # sym applied lazily
        term2 = cov_t.outer_decomp(out[r - 3]).scale(float(r - 1))
        out.append(term1.add_decomp(term2))
    return out


def polynomial_expectation(coeffs: Sequence, moments: Sequence) -> jnp.ndarray:
    """E[Σ_r ⟨A_r, x^⊗r⟩] = Σ_r ⟨A_r, m_r⟩ — full contraction of matching
    ranks (tensordot over all axes)."""
    total = jnp.zeros(())
    for A in coeffs:
        m = moments[A.rank - 1]
        if m.rank != A.rank:
            raise ValueError("moments list must be indexed by rank-1")
        res = tensordot(A, m, axes=A.rank)
        res = res.todense() if hasattr(res, "todense") else res
        total = total + jnp.asarray(res).reshape(())
    return total


def hierarchy_step(
    A, chi_list: Sequence, n_times: int = 1, rule: str = "all"
):
    """One step of a moment-hierarchy propagation: contract `n_times`
    indices of the coupling tensor A against the per-index tensors χ_i
    (reference contract_tensor_list semantics, symalg.py:555)."""
    return contract_tensor_list(A, chi_list, n_times=n_times, rule=rule)
