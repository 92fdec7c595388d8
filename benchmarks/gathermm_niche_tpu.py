"""Re-measure gather_mm's niche vs its competitors, on the real TPU.

VERDICT round-2 item 9: the one-hot-MXU gather kernel (kernels/gather_mm.py)
won 5x over XLA's subset-gather loop for the symmetric OUTER at C1 size in
round 1, but the pair-contraction GEMM route has since taken over the
symmetrized TENSORDOT at every size both serve.  This probe measures, warm
and same-process, every (op, size) where two or more routes apply:

  outer rank-3 x rank-3, dim in {20, 30, 40, 56}:
    a) gather_mm one-hot MXU kernel (production default when usable)
    b) subset fancy-index gather loop (the XLA fallback)
    c) EXPERIMENTAL paired-k0: G = a b^T one GEMM, then n_sub fused-index
       gathers from G.flatten() (the tensordot paired route at k = 0 --
       not currently wired for outer)

  tensordot rank-3 x rank-3 axes=1, dim in {20, 30, 40, 56}:
    a) paired GEMM route (production default, eager)
    b) gather_mm table route (forced; production only reaches it traced)
    c) einsum table route (XLA gathers)

Timing: K dependent dispatches + one scalar readback minus the measured
readback floor (bench.py:device_time; block_until_ready does not fence
through the axon tunnel).

Outcome recorded in docs/benchmarks.md ("gather_mm niche" table); routing
changes, if any, follow the numbers.
"""

import sys
import time
import itertools

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from symtensor_tpu.core.flat import FlatSymmetricTensor
from symtensor_tpu.ops.outer import (
    _combine_paired,
    _subset_tables,
    _tensordot_tables,
)
from symtensor_tpu.kernels import gather_mm
from symtensor_tpu.utils import combinatorics as comb
from symtensor_tpu.utils.tables import tables
from symtensor_tpu.config import config


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def measure_floor():
    x = jnp.zeros((1,), jnp.float32)
    fence(x)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        fence(x)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def device_time(fn, floor, repeats=8):
    float(jnp.sum(fn()))  # warm/compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(repeats):
            r = jnp.sum(fn())
            acc = r if acc is None else acc + r
        float(acc)
        ts.append(time.perf_counter() - t0)
    return max((float(np.median(ts)) - floor) / repeats, 1e-9)


def paired_k0(af, bf):
    """Experimental outer via one GEMM + fused-index gathers (k = 0)."""
    ra, rb, dim = af.rank, bf.rank, af.dim
    r = ra + rb
    t_out = tables(r, dim)
    rep = t_out.rep_np()
    n_b = bf.data.shape[0]
    subsets = list(itertools.combinations(range(r), ra))
    pa = np.empty((len(subsets), len(rep)), np.int64)
    pb = np.empty_like(pa)
    t_a, t_b = tables(ra, dim), tables(rb, dim)
    for si, S in enumerate(subsets):
        Sc = [i for i in range(r) if i not in S]
        pa[si] = t_a.layout.position_array(np.sort(rep[:, S], axis=1))
        pb[si] = t_b.layout.position_array(np.sort(rep[:, Sc], axis=1))
    n_a = af.data.shape[0]
    # fused index pa*n_b + pb must fit int32 (the caller's n*n gate is the
    # only other guard; at dim=100 n^2 ≈ 3.1e10 would silently overflow)
    assert n_a * n_b < 2**31, (n_a, n_b)
    fused = jnp.asarray((pa * n_b + pb).astype(np.int32))

    @jax.jit
    def fn(a, b, fused_tbl):
        G = jnp.outer(a, b).reshape(-1)
        return jnp.mean(G[fused_tbl], axis=0)

    return lambda: fn(af.data, bf.data, fused)


@jax.jit
def _subset_loop_fn(a, b, ta, tb):
    # tables are ARGUMENTS: closed-over tables get baked into the program
    # as constants, whose serialized form blew the remote-compile helper's
    # HTTP 413 upload cap at d = 40 (round-4 probe failure)
    acc = None
    for s in range(ta.shape[0]):
        term = a[ta[s]] * b[tb[s]]
        acc = term if acc is None else acc + term
    return acc / ta.shape[0]


def subset_loop(af, bf):
    ta, tb = _subset_tables(af.rank, bf.rank, af.dim)
    ta_d, tb_d = jnp.asarray(ta), jnp.asarray(tb)
    return lambda: _subset_loop_fn(af.data, bf.data, ta_d, tb_d)


@jax.jit
def _einsum_tables_fn(a, b, A_tab, B_tab, gam):
    acc = None
    for s in range(A_tab.shape[0]):
        term = jnp.einsum("c,co->o", gam, a[A_tab[s]] * b[B_tab[s]])
        acc = term if acc is None else acc + term
    return acc / A_tab.shape[0]


def einsum_tables(af, bf, k):
    A_tab, B_tab, gam, n_sub = _tensordot_tables(af.rank, bf.rank, k, af.dim)
    A_d, B_d, g_d = jnp.asarray(A_tab), jnp.asarray(B_tab), jnp.asarray(gam)
    return lambda: _einsum_tables_fn(af.data, bf.data, A_d, B_d, g_d)


@jax.jit
def _xla_gather_combine_fn(a, b, idxA, idxB, w):
    return jnp.einsum(
        "r,ro->o", w, a[idxA] * b[idxB],
        precision=jax.lax.Precision.HIGHEST,
    )


def synthetic_crossover(floor, n_srcs=(11480, 30856, 64824, 131072),
                        n_out=2_000_000, R=20):
    """One-hot-MXU vs XLA gather as a function of SOURCE size alone.

    The real outer at d ≥ 56 cannot host the comparison (its (n_sub,
    C(d+5,6)) subset tables are multi-GB), but the crossover depends on
    n_src, not on which op the gather serves: one-hot costs ~n_src MXU
    MACs per gathered element while XLA's gather rate is n_src-
    independent.  Random (R, n_out) indices into an (n_src,) source give
    the crossover directly; n_src values bracket d = 40/56/72 rank-3
    table sizes and the current _MAX_SRC cap."""
    rows = []
    for n_src in n_srcs:
        key = jax.random.PRNGKey(n_src)
        a = jax.random.normal(key, (n_src,), jnp.float32)
        b = jax.random.normal(jax.random.PRNGKey(n_src + 1), (n_src,),
                              jnp.float32)
        idxA = jax.random.randint(
            jax.random.PRNGKey(2), (R, n_out), 0, n_src, jnp.int32)
        idxB = jax.random.randint(
            jax.random.PRNGKey(3), (R, n_out), 0, n_src, jnp.int32)
        w = jnp.full((R,), 1.0 / R, jnp.float32)
        res = {}
        res["xla"] = device_time(
            lambda: _xla_gather_combine_fn(a, b, idxA, idxB, w), floor)
        res["gather_mm"] = device_time(
            lambda: gather_mm.gather_combine(a, b, idxA, idxB, weights=w),
            floor)
        got = gather_mm.gather_combine(a, b, idxA, idxB, weights=w)
        ref = _xla_gather_combine_fn(a, b, idxA, idxB, w)
        res["rel"] = float(jnp.max(jnp.abs(got - ref)) /
                           (jnp.max(jnp.abs(ref)) + 1e-30))
        rows.append((n_src, res))
        print(f"synthetic n_src={n_src:7d}: "
              f"gather_mm={res['gather_mm']*1e3:8.2f}ms  "
              f"xla={res['xla']*1e3:8.2f}ms  rel={res['rel']:.1e}",
              flush=True)
    return rows


def main():
    print(f"device = {jax.devices()[0]}", flush=True)
    floor = measure_floor()
    print(f"readback floor = {floor*1e3:.1f} ms", flush=True)
    # source-size crossover first (cheap, covers d = 40/56/72-equivalent
    # source sizes that the real outer's multi-GB tables cannot host)
    synthetic_crossover(floor)
    # the d=40 subset tables exceed the default 2e8-entry guard
    config.max_table_entries = 600_000_000
    rows = []
    # d = 56 outer dropped: its (20, C(61,6)) subset tables are ~4.4 GB
    # EACH — the synthetic sweep above carries the crossover beyond d=40
    for dim in (20, 30, 40):
        n = comb.indep_size(3, dim)
        key = jax.random.PRNGKey(dim)
        a = FlatSymmetricTensor._raw(
            3, dim, jax.random.normal(key, (n,), jnp.float32))
        b = FlatSymmetricTensor._raw(
            3, dim, jax.random.normal(jax.random.PRNGKey(dim + 1), (n,),
                                      jnp.float32))

        # ---- outer ----
        ta, tb = _subset_tables(3, 3, dim)
        n_sub = ta.shape[0]
        res = {}
        if gather_mm.fits(n, n, n_sub):
            res["gather_mm"] = device_time(
                lambda: gather_mm.gather_combine(a.data, b.data, ta, tb),
                floor)
        res["subset_loop"] = device_time(subset_loop(a, b), floor)
        n_out6 = comb.indep_size(6, dim)
        if n * n <= 400_000_000 and n_out6 * 20 <= 400_000_000:
            res["paired_k0"] = device_time(paired_k0(a, b), floor)
        # numeric agreement
        ref = subset_loop(a, b)()
        for name in ("gather_mm", "paired_k0"):
            if name in res:
                got = (gather_mm.gather_combine(a.data, b.data, ta, tb)
                       if name == "gather_mm" else paired_k0(a, b)())
                rel = float(jnp.max(jnp.abs(got - ref)) /
                            (jnp.max(jnp.abs(ref)) + 1e-30))
                res[name + "_rel"] = rel
        rows.append(("outer", dim, n, res))
        print(f"outer  d={dim:3d} n={n:6d}: " + "  ".join(
            f"{k}={v*1e3:8.2f}ms" if not k.endswith("_rel")
            else f"{k}={v:.1e}" for k, v in res.items()), flush=True)

        # ---- tensordot axes=1 ----
        res = {}
        res["paired"] = device_time(lambda: _combine_paired(a, b, 1), floor)
        A_tab, B_tab, gam, nsb = _tensordot_tables(3, 3, 1, dim)
        R = nsb * A_tab.shape[1]
        if gather_mm.fits(n, n, R):
            w = jnp.tile(gam, nsb) / nsb
            At, Bt = A_tab.reshape(R, -1), B_tab.reshape(R, -1)
            res["gather_mm"] = device_time(
                lambda: gather_mm.gather_combine(
                    a.data, b.data, At, Bt, weights=w), floor)
        res["einsum_tables"] = device_time(einsum_tables(a, b, 1), floor)
        ref = einsum_tables(a, b, 1)()
        got = _combine_paired(a, b, 1)
        res["paired_rel"] = float(jnp.max(jnp.abs(got - ref)) /
                                  (jnp.max(jnp.abs(ref)) + 1e-30))
        if "gather_mm" in res:
            # check the timed computation, not just its timing: the row
            # order of the tiled weights/tables must match
            # _tensordot_tables' (n_sub, n_k, n_out) layout
            got_g = gather_mm.gather_combine(
                a.data, b.data, At, Bt, weights=w)
            res["gather_mm_rel"] = float(
                jnp.max(jnp.abs(got_g - ref)) /
                (jnp.max(jnp.abs(ref)) + 1e-30))
        rows.append(("td_k1", dim, n, res))
        print(f"td k=1 d={dim:3d} n={n:6d}: " + "  ".join(
            f"{k}={v*1e3:8.2f}ms" if not k.endswith("_rel")
            else f"{k}={v:.1e}" for k, v in res.items()), flush=True)

    print("\nsummary (ms):")
    for op, dim, n, res in rows:
        print(op, dim, {k: round(v * 1e3, 2) for k, v in res.items()
                        if not k.endswith("_rel")})


if __name__ == "__main__":
    main()
