"""Attribute the rank-6 flagship's per-root-window fixed overhead.

CLAUDE.md (round-2 close): the rank-6 dim-100 basis change runs 10 root
windows; the first covers 46 % of outputs in ~1800 s, but every LATER
window costs ~600 s for only ~5 % of outputs each — a per-window fixed
overhead that dominates the 7284 s total.  Before building anything,
measure WHERE those 600 s go (docs/design_slab_gather.md round-2 close
addendum: "attribute with SYMTENSOR_BASIS_FENCE_EVERY=1 on ONE window
before building anything").

This probe runs ONLY the last root window (b in [90, 100), the smallest
subtree) on a zeros root (gathers/DMA are data-independent, so timings
are representative — same trick as SYMTENSOR_FLAGSHIP_FAKE):

  pass A: SYMTENSOR_BASIS_FENCE_EVERY=1 + verbose — per-chunk fences make
          the log timestamps attribute cost to phases (root-pass chunks,
          per-row level-1 sweeps, deep-level chunks, leaf emits);
  pass B: default fence cadence, same process — the true (production)
          per-window cost, with pass A as its compile warm-up.  Same-
          process A/B is the only trustworthy comparison through the
          tunnel (separate runs hours apart differ ±25 %).

Usage: python benchmarks/root_window_attrib.py [rank dim] (default 6 100)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SYMTENSOR_BASIS_ROOT_WINDOW_RANGE", "90:100")
os.environ.setdefault("SYMTENSOR_BASIS_VERBOSE", "1")

import jax
import jax.numpy as jnp

import symtensor_tpu as st
from symtensor_tpu.config import config
from symtensor_tpu.ops.basis_change import basis_change_packed
from symtensor_tpu.utils import combinatorics as comb


def run_once(rank, dim, kw, label):
    n = comb.indep_size(rank, dim)
    sdt = jnp.bfloat16 if n > 200_000_000 else jnp.float32
    buf = jnp.zeros((n,), sdt)
    A = st.FlatSymmetricTensor._raw(rank, dim, buf)
    del buf
    float(A.data[0])
    import numpy as np

    rng = np.random.default_rng(7)
    Q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    W = jnp.asarray(Q, jnp.float32)
    t0 = time.time()
    C = basis_change_packed(A, W, store_dtype=sdt, **kw)
    float(C.data[0])
    dt = time.time() - t0
    print(f"[attrib] {label}: {dt:.1f}s "
          f"(window range {os.environ['SYMTENSOR_BASIS_ROOT_WINDOW_RANGE']})",
          flush=True)
    del C
    return dt


def main():
    rank = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    config.max_table_entries = 3_000_000_000
    kw = dict(
        block_elems=int(os.environ.get(
            "SYMTENSOR_FLAGSHIP_BLOCK_ELEMS", 2_000_000_000)),
        transient_elems=int(os.environ.get(
            "SYMTENSOR_FLAGSHIP_TRANSIENT_ELEMS", 50_000_000)),
        onthefly_above=250_000_000,
        donate_root=True,
    )
    print(f"device = {jax.devices()[0]}", flush=True)

    os.environ["SYMTENSOR_BASIS_FENCE_EVERY"] = "1"
    run_once(rank, dim, kw, "pass A (fence-every-1, incl. compile)")

    del os.environ["SYMTENSOR_BASIS_FENCE_EVERY"]
    run_once(rank, dim, kw, "pass B (default cadence, warm)")


if __name__ == "__main__":
    main()
