"""Time one `basis_change._step_kernel` chunk at chosen level shapes.

The rank-6 fenced flagship shows deep-level steps paying seconds per
chunk where the byte model says milliseconds (e.g. L4→5 k=1 chunks at
~2.7 s for a ~1.9 GB gather+GEMM).  This probe builds the exact kernel
the production schedule would pick for a synthetic parent block and
fences one warm call, so forms can be compared in isolation:

  python benchmarks/step_shape_probe.py npar k [d wp nsel seg]

Shapes of interest (rank-6 dim-100 fenced run):
  L4→5:  npar=47850 k=1   (width 5151,  n_k=100)
  L3→4:  npar=1375  k=2   (width 176851, n_k=5151)
  L2→3:  npar=50    k=3   (width 4421275, n_k=176851)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from symtensor_tpu.ops import basis_change as bc
from symtensor_tpu.utils import combinatorics as comb
from symtensor_tpu.utils.tables import tables


def fence(x) -> float:
    return float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))


def main():
    npar = int(sys.argv[1]) if len(sys.argv) > 1 else 47850
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    wp = int(sys.argv[4]) if len(sys.argv) > 4 else 14
    nsel = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    seg_arg = int(sys.argv[6]) if len(sys.argv) > 6 else 0

    width = comb.indep_size(k + 1, d)
    n_k = comb.indep_size(k, d)
    store = "bfloat16" if npar * width > 4e8 else "float32"
    transient = int(os.environ.get(
        "SYMTENSOR_BASIS_TRANSIENT_ELEMS", "50000000"))

    # mirror the production seg choice (basis_change.process)
    Rc = nsel if nsel else npar * wp
    cost = npar * (d + max(wp, 128)) + 2 * max(Rc, 128)
    fly = n_k * d > 250_000_000
    if fly:
        cost += d * (k + 2) * 3
    seg = seg_arg or int(max(1, min(n_k, transient // max(1, cost))))
    nsel_pad = Rc
    print(
        f"npar={npar} k={k} d={d} width={width:,} n_k={n_k:,} wp={wp} "
        f"nsel={nsel_pad} seg={seg} fly={fly} store={store} "
        f"device={jax.devices()[0]}",
        flush=True,
    )

    U = jnp.zeros((npar * width,), jnp.dtype(store))
    fence(U[:1])
    W = jnp.asarray(
        np.random.default_rng(0).normal(size=(d, d + wp)), jnp.float32
    )

    if fly:
        rep_np = tables(k, d).rep_np()
        dt = np.int8 if d <= 127 else np.int16
        tbl = jnp.asarray(rep_np.astype(dt).reshape(-1))
    else:
        tbl = jnp.asarray(tables(k + 1, d).insert_table_np(k))
    fence(tbl.reshape(-1)[:1])

    # one full-width selector: children (b, all parents) until nsel_pad
    groups = []
    got = 0
    b = 0
    while got < nsel_pad and b < wp:
        c = min(npar, nsel_pad - got)
        groups.append((b, 0, c))
        got += c
        b += 1
    arr = np.zeros((3, wp), np.int32)
    for i, (bb, p0, c) in enumerate(groups):
        arr[0, i], arr[1, i], arr[2, i] = bb, p0, c
    g = jnp.asarray(arr)

    kern = bc._step_kernel(
        npar, (npar * width,), n_k, d, k, wp, nsel_pad, seg,
        store, "float32", fly, None,
    )

    t0 = time.time()
    out = kern((U,), tbl, W, jnp.int32(0), g[0], g[1], g[2])
    fence(out[:1])
    print(f"cold (incl. compile): {time.time()-t0:.2f}s", flush=True)
    for rep in range(2):
        t0 = time.time()
        out = kern((U,), tbl, W, jnp.int32(0), g[0], g[1], g[2])
        fence(out[:1])
        dt = time.time() - t0
        gathered = nsel_pad and npar * seg * d * (-(-n_k // seg))
        print(
            f"warm: {dt:.3f}s  gather {gathered/1e6:.0f}M el "
            f"({gathered/dt/1e6:.0f} M el/s), out {n_k*nsel_pad/1e6:.0f}M",
            flush=True,
        )


if __name__ == "__main__":
    main()
