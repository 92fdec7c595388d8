"""TPU validation + timing of the case-decomposed root-pass kernel.

Stages (least crash-risk first, one process to amortize first-contact):
  1. rank-4 dim-60 f32: root-kernel path vs generic path, exact compare.
  2. rank-5 dim-100 f32: full basis change with the root kernel; the
     round-2 recorded generic-path number is 84.9-102.6 s warm
     (docs/benchmarks.md) with the root element gather ~16 s of it.

Usage: python benchmarks/basis_root_tpu.py [stage...]   (default: 1 2)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import symtensor_tpu as st
from symtensor_tpu import symalg
from symtensor_tpu.ops.basis_change import basis_change_packed
from symtensor_tpu.utils import combinatorics as comb


def fence(x) -> float:
    return float(jnp.asarray(x).reshape(-1)[0])


def run(rank, dim, *, compare, warm=False, seed=0, **kw):
    n = comb.indep_size(rank, dim)
    A = st.FlatSymmetricTensor._raw(
        rank, dim,
        jax.random.normal(jax.random.PRNGKey(seed), (n,), jnp.float32),
    )
    fence(A.data[:1])
    rng = np.random.default_rng(7)
    Q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    W = jnp.asarray(Q, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (dim,), jnp.float32)

    os.environ["SYMTENSOR_BASIS_ROOT"] = "1"
    t0 = time.time()
    C = basis_change_packed(A, W, **kw)
    fence(C.data[:1])
    t_new = time.time() - t0
    print(f"rank={rank} dim={dim} root-kernel path: {t_new:.1f}s",
          flush=True)

    lhs = float(symalg.contract_all_indices_with_vector(C, x))
    rhs = float(symalg.contract_all_indices_with_vector(A, W @ x))
    rel = abs(lhs - rhs) / max(abs(rhs), 1e-30)
    print(f"  identity rel={rel:.3e}", flush=True)

    if warm:
        C = None  # free before the repeat
        t0 = time.time()
        C = basis_change_packed(A, W, **kw)
        fence(C.data[:1])
        print(f"  root-kernel warm: {time.time()-t0:.1f}s", flush=True)

    if compare:
        os.environ["SYMTENSOR_BASIS_ROOT"] = "0"
        t0 = time.time()
        C_old = basis_change_packed(A, W, **kw)
        fence(C_old.data[:1])
        t_old = time.time() - t0
        err = float(jnp.max(jnp.abs(C.data - C_old.data)))
        print(f"  generic path: {t_old:.1f}s  max|Δ|={err:.3e}",
              flush=True)
        os.environ["SYMTENSOR_BASIS_ROOT"] = "1"
        # warm second pass on the root-kernel path
        t0 = time.time()
        C2 = basis_change_packed(A, W, **kw)
        fence(C2.data[:1])
        print(f"  root-kernel warm: {time.time()-t0:.1f}s", flush=True)


def main():
    stages = [int(a) for a in sys.argv[1:]] or [1, 2]
    print(f"device = {jax.devices()[0]}", flush=True)
    if 1 in stages:
        run(4, 60, compare=True)
    if 2 in stages:
        run(5, 100, compare=False, warm=True,
            block_elems=2_100_000_000, transient_elems=50_000_000,
            onthefly_above=250_000_000)


if __name__ == "__main__":
    main()
