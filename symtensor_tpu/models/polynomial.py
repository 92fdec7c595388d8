"""SymmetricPolynomial — the flagship model.

The reference's motivating workload (README.md:13): field-theory methods on
neural networks represent polynomial couplings as symmetric coefficient
tensors; evaluating the polynomial is `contract_all_indices_with_vector`.
This module packages that workload as a trainable JAX model:

    y(x) = c₀ + Σ_{r ∈ ranks} ⟨A_r, x^{⊗r}⟩

with the A_r stored in any symtensor format (pytree params ⇒ jit / vmap /
grad / optax / sharding all compose).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.flat import FlatSymmetricTensor
from ..ops.contract import contract_all_indices_with_vector
from ..utils import combinatorics as comb


def init(
    key,
    ranks: Sequence[int],
    dim: int,
    scale: float = 1e-2,
    dtype=jnp.float32,
) -> Dict:
    """Random parameters: one packed symmetric tensor per rank + bias."""
    params = {"bias": jnp.zeros((), dtype=dtype), "terms": {}}
    for r in ranks:
        key, sub = jax.random.split(key)
        n = comb.indep_size(r, dim)
        data = scale * jax.random.normal(sub, (n,), dtype=dtype)
        params["terms"][f"rank{r}"] = FlatSymmetricTensor._raw(r, dim, data)
    return params


def apply(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the polynomial at a single input x (dim,)."""
    out = params["bias"]
    for t in params["terms"].values():
        out = out + contract_all_indices_with_vector(t, x)
    return out


def apply_batched(params: Dict, xs: jnp.ndarray) -> jnp.ndarray:
    """(B, dim) → (B,) via vmap."""
    return jax.vmap(lambda x: apply(params, x))(xs)


def loss_fn(params: Dict, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    pred = apply_batched(params, xs)
    return jnp.mean((pred - ys) ** 2)


def train_step(params: Dict, opt_state, xs, ys, optimizer):
    """One optax update; returns (params, opt_state, loss)."""
    loss, grads = jax.value_and_grad(loss_fn)(params, xs, ys)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    import optax

    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
