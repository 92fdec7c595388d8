"""Dense symmetrization and symmetry checking (jnp).

These are the *correctness oracles* of the framework (reference
``utils.symmetrize``, symtensor/utils.py:507-532, sums all r! transposes).
Production ops never call them on large data; they exist so every compressed
op can be tested against `symmetrize(dense_op(...))`.

Improvements over the reference:
- `symmetrize` uses the coset recursion  S_r = S'_{r-1} ∘ avg_k(moveaxis k→0)
  which needs O(r²) transposes instead of r! (the reference's rank-8 oracle
  took 592 ms for 6561 elements for this reason, utils.py:555).
- `is_symmetric` checks invariance under the r−1 adjacent transpositions
  (a generating set of S_r) instead of all permutations.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def symmetrize(arr: jnp.ndarray) -> jnp.ndarray:
    """Project a dense array onto its symmetric part:
    out = (1/r!) Σ_σ transpose(arr, σ).

    Uses the coset decomposition S_r = ⋃_k (k↔0)·S_{r-1}: average the r
    cyclic moveaxis images, then recursively symmetrize the trailing r−1
    axes of the average (linearity lets the subgroup average commute with
    the sum). O(r²) transposes total.
    """
    arr = jnp.asarray(arr)
    r = arr.ndim
    if r <= 1:
        return arr

    def _sym_trailing(a: jnp.ndarray, start: int) -> jnp.ndarray:
        """Symmetrize axes start..r-1 of `a`."""
        k = r - start
        if k <= 1:
            return a
        acc = a
        for ax in range(start + 1, r):
            acc = acc + jnp.moveaxis(a, ax, start)
        acc = acc / k
        return _sym_trailing(acc, start + 1)

    return _sym_trailing(arr, 0)


def is_symmetric(arr, rtol: float = 1e-5, atol: float = None) -> bool:
    """True if `arr` is (numerically) invariant under axis permutations.
    Checks the r−1 adjacent transpositions, which generate S_r.

    The default absolute tolerance is dtype-aware (100·eps·max|arr|): an
    array produced by `symmetrize` in float32 is symmetric only up to
    rounding of the averaging recursion, and a fixed 1e-8 atol would reject
    its small entries."""
    arr = np.asarray(arr)
    r = arr.ndim
    if len(set(arr.shape)) > 1:
        return False
    if atol is None:
        if arr.dtype.kind == "f":
            scale = float(np.max(np.abs(arr))) if arr.size else 0.0
            atol = 100.0 * float(np.finfo(arr.dtype).eps) * max(scale, 1e-30)
        else:
            atol = 0.0
    for ax in range(r - 1):
        if not np.allclose(
            arr, np.swapaxes(arr, ax, ax + 1), rtol=rtol, atol=atol
        ):
            return False
    return True
