"""Per-g-chunk timing of one root-pass window at flagship shapes.

The rank-6 dim-100 flagship spends ~600 s per root window while the
byte-traffic model says a sweep should cost seconds
(docs/design_slab_gather.md); this probe fences each g-chunk program of
`basis_root.root_pass_kernel` separately to localize the cost:

  python benchmarks/root_window_probe.py [k d npar] [--fake]

k=5 d=100 is the rank-6 root (parent = rank 6, 1.6e9 elements bf16);
k=4 d=100 is the rank-5 root / the rank-6 t=1 per-row shape.
`--fake` zero-fills the parent (gather/DMA cost is data-independent).

Stage output: per-chunk wall for the FIRST window (cold, incl. compile)
and a SECOND window (warm) — the warm line is the per-window fixed
overhead the flagship pays d_out/npar times.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from symtensor_tpu.ops import basis_root as br
from symtensor_tpu.utils import combinatorics as comb


def fence(x) -> float:
    return float(jnp.asarray(x).reshape(-1)[0])


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    fake = "--fake" in sys.argv[1:]
    k = int(args[0]) if len(args) > 0 else 5
    d = int(args[1]) if len(args) > 1 else 100
    npar = int(args[2]) if len(args) > 2 else 10
    store = jnp.bfloat16 if comb.indep_size(k + 1, d) > 2e8 else jnp.float32

    n_par = comb.indep_size(k + 1, d)
    n_k = comb.indep_size(k, d)
    print(
        f"k={k} d={d} npar={npar}: parent {n_par:,} el "
        f"({n_par*jnp.dtype(store).itemsize/1e9:.2f} GB {jnp.dtype(store).name}), "
        f"child window {npar}x{n_k:,}, device={jax.devices()[0]}",
        flush=True,
    )

    t0 = time.time()
    if fake:
        A = jnp.zeros((n_par,), store)
    else:
        A = jax.random.normal(jax.random.PRNGKey(0), (n_par,), store)
    fence(A[:1])
    print(f"parent materialized {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(7)
    W = jnp.asarray(rng.normal(size=(d, d)), jnp.float32)
    Wp = jnp.concatenate([W, jnp.zeros((d, npar), jnp.float32)], axis=1)

    t0 = time.time()
    groups = br.split_root_groups(A, k, d)
    fence(groups[-1][:1, :1])
    print(f"group split {time.time()-t0:.1f}s", flush=True)
    del A

    budget = int(os.environ.get("SYMTENSOR_BASIS_ROOT_SLICES", "600"))
    chunks = br.g_chunks(d, budget)
    IH_J = br.root_tables_jnp(k, d)
    fence(IH_J[1][:1, :1])

    kerns = [
        br.root_pass_kernel(
            k, d, npar, str(jnp.dtype(store)), "float32",
            tile_elems=int(os.environ.get(
                "SYMTENSOR_BASIS_TRANSIENT_ELEMS", "50000000")),
            g0=c0, g1=c1,
        )
        for c0, c1 in chunks
    ]

    for label, b_lo in (("cold", 0), ("warm", npar)):
        t_win = time.time()
        for (c0, c1), kern in zip(chunks, kerns):
            t0 = time.time()
            out = kern(tuple(groups[c0:]), Wp, jnp.int32(b_lo), *IH_J)
            fence(out[:1])
            cols = br.chunk_cols(k, d, c0, c1)
            dt = time.time() - t0
            incid = sum(
                comb.multiset_count(g + 1, k - 3)
                * comb.tri_size(d - g) * d
                for g in range(c0, c1)
            )
            print(
                f"  [{label}] g=[{c0:3d},{c1:3d}) cols={cols:>9,} "
                f"incid={incid/1e6:8.1f}M  {dt:7.2f}s "
                f"({incid/dt/1e6:8.1f} M incid/s)",
                flush=True,
            )
            del out
        print(f"[{label}] window total {time.time()-t_win:.1f}s", flush=True)


if __name__ == "__main__":
    main()
