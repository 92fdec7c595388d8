"""Controlled sweep of the emit-fence cadence for the rank-5 flagship
basis change: ONE process, one compile warm-up pass, then one warm pass
per SYMTENSOR_BASIS_EMIT_FENCE_EVERY setting (the env is read per call),
so tunnel day-to-day variance is shared across the settings.

Motivation: three separate flagship runs measured 61.3 / 74.7 / 85.1 s
warm under different fence cadences — but each was a different process
on a different tunnel hour, so the ordering is not trustworthy.

Usage: python benchmarks/basis_fence_sweep.py [rank dim]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import symtensor_tpu as st
from symtensor_tpu.config import config
from symtensor_tpu.ops.basis_change import basis_change_packed
from symtensor_tpu.utils import combinatorics as comb


def fence(x) -> float:
    return float(jnp.asarray(x).reshape(-1)[0])


def main():
    rank = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    config.max_table_entries = 3_000_000_000
    n = comb.indep_size(rank, dim)
    A = st.FlatSymmetricTensor._raw(
        rank, dim, jax.random.normal(jax.random.PRNGKey(0), (n,),
                                     jnp.float32)
    )
    fence(A.data[:1])
    print(f"rank={rank} dim={dim} resident on {jax.devices()[0]}",
          flush=True)

    rng = np.random.default_rng(7)
    Q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    W = jnp.asarray(Q, jnp.float32)
    kw = dict(store_dtype=jnp.float32, block_elems=1_900_000_000,
              transient_elems=50_000_000, onthefly_above=250_000_000)

    t0 = time.time()
    C = basis_change_packed(A, W, **kw)
    fence(C.data[:1])
    print(f"warm-up pass (incl. compile): {time.time()-t0:.1f}s",
          flush=True)

    # sweep — repeat the first setting at the end to expose drift
    for ev in (1, 4, 16, 1000, 1):
        os.environ["SYMTENSOR_BASIS_EMIT_FENCE_EVERY"] = str(ev)
        C = None
        t0 = time.time()
        C = basis_change_packed(A, W, **kw)
        fence(C.data[:1])
        print(f"emit_fence_every={ev:>4}: {time.time()-t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
