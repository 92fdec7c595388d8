"""Isolate the deep-level step's gather/GEMM/select stages and test the
width-major (row-slice) parent layout against the production npar-major
(axis-1) form at the rank-6 L4→5 shape.

The production kernel's warm chunk at npar=47850, k=1 runs 0.86 s
(benchmarks/step_shape_probe.py) — 553 M gathered el/s, ~40× off HBM
rate. Hypothesis: the axis-1 gather U[:, idx] on a row-major (npar,
width) block reads each gathered COLUMN at stride `width` (one cache
line per element); with the block stored width-major (width, npar) the
same access is `U[idx, :]` — seg·d contiguous slices of npar elements
(~190 KB each at this shape), which should run at DMA/HBM rate.

Stages (all warm-timed, f32, zeros data — gather cost is data-blind):
  g1) axis-1 gather G = U2[:, sl]            (production form)
  g2) row-slice gather Gt = Ut[sl, :]        (width-major form)
  g3) g2 + GEMM einsum('sdn,db->nsb')        (gather + MXU)
  g4) full production kernel                 (reference point)

Usage: python benchmarks/deep_gather_probe.py [npar k d wp seg]
"""

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


def timeit(fn, k=3):
    fence(fn())
    t0 = time.time()
    for _ in range(k):
        out = fn()
    fence(out)
    return (time.time() - t0) / k


def main():
    npar = int(sys.argv[1]) if len(sys.argv) > 1 else 47850
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    wp = int(sys.argv[4]) if len(sys.argv) > 4 else 14
    seg_arg = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    width = comb.indep_size(k + 1, d)
    n_k = comb.indep_size(k, d)
    seg = seg_arg or 4
    nseg = -(-n_k // seg)
    print(
        f"npar={npar} k={k} d={d} width={width:,} n_k={n_k} seg={seg} "
        f"nseg={nseg} device={jax.devices()[0]}",
        flush=True,
    )

    U = jnp.zeros((npar, width), jnp.float32)
    Ut = jnp.zeros((width, npar), jnp.float32)
    fence(U[:1, :1]), fence(Ut[:1, :1])
    W = jnp.asarray(
        np.random.default_rng(0).normal(size=(d, wp)), jnp.float32
    )
    tbl = jnp.asarray(tables(k + 1, d).insert_table_np(k))  # (n_k, d)
    tbl_p = jnp.concatenate(
        [tbl, jnp.broadcast_to(tbl[:1], (nseg * seg - n_k, d))]
    ).reshape(nseg, seg, d)

    gathered = npar * seg * d * nseg

    @jax.jit
    def g1(U, tbl_p):
        def body(sl):
            G = U[:, sl.reshape(-1)].reshape(npar, seg, d)
            return jnp.sum(G, axis=(0, 2))  # keep it gather-bound

        return jax.lax.map(body, tbl_p)

    t = timeit(lambda: g1(U, tbl_p))
    print(
        f"  g1 axis-1 (npar-major)   : {t:7.3f}s "
        f"({gathered/t/1e6:8.0f} M el/s)",
        flush=True,
    )

    @jax.jit
    def g2(Ut, tbl_p):
        def body(sl):
            G = Ut[sl.reshape(-1), :].reshape(seg, d, npar)
            return jnp.sum(G, axis=(1, 2))

        return jax.lax.map(body, tbl_p)

    t = timeit(lambda: g2(Ut, tbl_p))
    print(
        f"  g2 row-slice (width-major): {t:7.3f}s "
        f"({gathered/t/1e6:8.0f} M el/s)",
        flush=True,
    )

    @jax.jit
    def g3(Ut, tbl_p, W):
        def body(sl):
            G = Ut[sl.reshape(-1), :].reshape(seg, d, npar)
            H = jnp.einsum(
                "sdn,db->nsb", G, W,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return H

        return jax.lax.map(body, tbl_p)  # (nseg, npar, seg, wp)

    t = timeit(lambda: g3(Ut, tbl_p, W))
    print(
        f"  g3 row-slice + GEMM       : {t:7.3f}s "
        f"({gathered/t/1e6:8.0f} M el/s)",
        flush=True,
    )

    # g4: the production kernel end-to-end (same shapes as the step probe)
    nsel_pad = npar * wp
    groups = []
    got, b = 0, 0
    while got < nsel_pad and b < wp:
        c = min(npar, nsel_pad - got)
        groups.append((b, 0, c))
        got += c
        b += 1
    arr = np.zeros((3, wp), np.int32)
    for i, (bb, p0, c) in enumerate(groups):
        arr[0, i], arr[1, i], arr[2, i] = bb, p0, c
    g = jnp.asarray(arr)
    Wp = jnp.asarray(
        np.random.default_rng(0).normal(size=(d, d + wp)), jnp.float32
    )
    kern = bc._step_kernel(
        npar, (npar * width,), n_k, d, k, wp, nsel_pad, seg,
        "float32", "float32", False, None,
    )
    Uf = U.reshape(-1)
    t = timeit(lambda: kern((Uf,), tbl, Wp, jnp.int32(0), g[0], g[1], g[2]))
    print(
        f"  g4 production kernel      : {t:7.3f}s "
        f"({gathered/t/1e6:8.0f} M el/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
