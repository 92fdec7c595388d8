"""Head-to-head of child-select and emit-scatter forms at the rank-6
deep-level shapes where the fenced flagship burns its time.

Stage A — k=1 (L4→5) step variants at npar=48529, nsel=2.5M, wp=100:
  a1) production _step_kernel (seg from the production formula, ~3)
  a2) production kernel with seg forced to 25
  a3) one-shot: full-tri shared-index gather (10k idx) -> one GEMM ->
      (seg-axis transpose) -> axis-1 select -> transpose

Stage B — leaf emit scatter forms at nsel=16.7M into a 1.6e9 buffer:
  b1) production: element scatter, unique_indices=False (+ rank compute)
  b2) element scatter with all-unique indices, unique_indices=True
  b3) sorted-position element scatter
  b4) per-parent-run slice updates (nsel/run_len descriptors) via scan

Usage: python benchmarks/select_form_probe.py [A|B ...]
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from symtensor_tpu.ops import basis_change as bc
from symtensor_tpu.utils import combinatorics as comb
from symtensor_tpu.utils.tables import tables


def fence(x) -> float:
    return float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))


def timeit(fn, k=2):
    out = fn()
    fence(out)
    t0 = time.time()
    for _ in range(k):
        out = fn()
    fence(out)
    return (time.time() - t0) / k


def stage_a():
    d = 100
    k = 1
    npar = 48529
    nsel_pad = 2_500_000
    wp = 100
    width = comb.indep_size(k + 1, d)  # 5151
    n_k = d
    store = jnp.bfloat16

    U = jnp.zeros((npar * width,), store)
    fence(U[:1])
    W = jnp.asarray(
        np.random.default_rng(0).normal(size=(d, d + wp)), jnp.float32
    )
    tblA = jnp.asarray(tables(k + 1, d).insert_table_np(k))  # (100, 100)

    # group selectors: b-groups each taking a prefix of parents
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

    for label, seg in (("a1 production seg=auto", 0), ("a2 seg=25", 25)):
        cost = npar * (d + max(wp, 128)) + 2 * max(nsel_pad, 128)
        s = seg or int(max(1, min(n_k, 50_000_000 // cost)))
        kern = bc._step_kernel(
            npar, (npar * width,), n_k, d, k, wp, nsel_pad, s,
            "bfloat16", "float32", False, None,
        )
        t = timeit(lambda: kern((U,), tblA, W, jnp.int32(0), g[0], g[1], g[2]))
        print(f"  {label:24s} seg={s:3d}: {t:7.3f}s", flush=True)

    # a3: one-shot full-fan
    tri_full = tblA.reshape(-1)  # (d*d,) positions into width

    sel_par, sel_b = [], []
    for bb, p0, c in groups:
        sel_par.append(np.arange(p0, p0 + c))
        sel_b.append(np.full(c, bb))
    sel_par = jnp.asarray(np.concatenate(sel_par).astype(np.int32))
    sel_b = jnp.asarray(np.concatenate(sel_b).astype(np.int32))

    @jax.jit
    def oneshot(U, W, sel_par, sel_b):
        U2 = U.reshape(npar, width)
        G = U2[:, tri_full].reshape(npar * d, d)  # (npar*d, d)
        H = jax.lax.dot_general(
            G, W[:, :wp].astype(store),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(npar, d, wp)
        Ht = jnp.transpose(H, (1, 0, 2)).reshape(d, npar * wp)
        sel = Ht[:, sel_par * wp + sel_b]  # (d, nsel)
        return sel.T.reshape(-1).astype(store)

    t = timeit(lambda: oneshot(U, W, sel_par, sel_b))
    print(f"  a3 one-shot full-fan        : {t:7.3f}s", flush=True)


def stage_b():
    n_out = 1_609_344_100
    nsel = 16_700_000
    rng = np.random.default_rng(1)
    store = jnp.bfloat16

    out = jnp.zeros((n_out + nsel,), store)
    fence(out[:1])
    vals = jnp.ones((nsel,), store)

    pos_np = rng.choice(n_out, size=nsel, replace=False).astype(np.int64)
    pos = jnp.asarray(pos_np.astype(np.int32))
    pos_sorted = jnp.asarray(np.sort(pos_np).astype(np.int32))

    def run(p, unique):
        # donated: a non-donated scatter copies the 3.2 GB buffer per rep
        # (and OOMed when run after stage A in the same process)
        @jax.jit
        def f(out, vals, p):
            return out.at[p].set(vals, unique_indices=unique)

        f2 = jax.jit(f, donate_argnums=(0,))
        nonlocal_out = [f2(out + 0, vals, p)]
        fence(nonlocal_out[0][:1])
        t0 = time.time()
        for _ in range(3):
            nonlocal_out[0] = f2(nonlocal_out[0], vals, p)
        fence(nonlocal_out[0][:1])
        del nonlocal_out
        return (time.time() - t0) / 3

    print(f"  b1 scatter unique=False     : {run(pos, False):7.3f}s",
          flush=True)
    print(f"  b2 scatter unique=True      : {run(pos, True):7.3f}s",
          flush=True)
    print(f"  b3 sorted scatter uniq=True : {run(pos_sorted, True):7.3f}s",
          flush=True)

    # b4: per-run slice updates, run length 50, via fori over dynamic slices
    run_len = 50
    nruns = nsel // run_len
    starts_np = np.sort(
        rng.choice(n_out // run_len, size=nruns, replace=False)
    ).astype(np.int32) * run_len
    starts = jnp.asarray(starts_np)
    vals2 = jnp.ones((nruns, run_len), store)

    @partial(jax.jit, donate_argnums=(0,))
    def f4(out, vals2, starts):
        def body(i, o):
            return jax.lax.dynamic_update_slice(
                o, vals2[i], (starts[i],)
            )
        return jax.lax.fori_loop(0, nruns, body, out)

    buf = [f4(out + 0, vals2, starts)]
    fence(buf[0][:1])
    t0 = time.time()
    for _ in range(3):
        buf[0] = f4(buf[0], vals2, starts)
    fence(buf[0][:1])
    t = (time.time() - t0) / 3
    print(f"  b4 {nruns} runs of {run_len} (fori DUS): {t:7.3f}s",
          flush=True)


def stage_c():
    """The fused-leaf-emit scatter pattern: (npar, wp) grid, positions
    base[par] + j for valid slots (consecutive within a parent), distinct
    dump slots for invalid — measures the post-fusion leaf floor."""
    n_out = 1_609_344_100
    npar, wp = 2_000_000, 8
    store = jnp.bfloat16
    rng = np.random.default_rng(2)

    out = jnp.zeros((n_out + bcDUMP,), store)
    fence(out[:1])
    H = jnp.ones((npar, wp), store)
    base = jnp.asarray(
        rng.choice(n_out - wp, size=npar, replace=False).astype(np.int32)
    )
    starts = jnp.zeros((wp,), jnp.int32)
    counts_np = rng.integers(0, npar, size=wp).astype(np.int32)
    counts = jnp.asarray(counts_np)

    @partial(jax.jit, donate_argnums=(0,))
    def f(out, H, base, starts, counts):
        par = jnp.arange(npar, dtype=jnp.int32)[:, None]
        j = jnp.arange(wp, dtype=jnp.int32)[None, :]
        valid = (par >= starts[None, :]) & (par < (starts + counts)[None, :])
        pos = base[:, None] + j
        s = jnp.arange(npar * wp, dtype=jnp.int32)
        posf = jnp.where(
            valid.reshape(-1), pos.reshape(-1), n_out + s % bcDUMP
        )
        return out.at[posf].set(H.reshape(-1), unique_indices=False)

    buf = [f(out + 0, H, base, starts, counts)]
    fence(buf[0][:1])
    t0 = time.time()
    for _ in range(3):
        buf[0] = f(buf[0], H, base, starts, counts)
    fence(buf[0][:1])
    t = (time.time() - t0) / 3
    nvalid = int(counts_np.sum())
    print(
        f"  c1 fused-emit pattern npar={npar} wp={wp} "
        f"({nvalid/1e6:.1f}M valid of {npar*wp/1e6:.0f}M): {t:7.3f}s "
        f"({npar*wp/t/1e6:6.1f} M slots/s)",
        flush=True,
    )


bcDUMP = 4096


def main():
    stages = sys.argv[1:] or ["A", "B"]
    print(f"device={jax.devices()[0]}", flush=True)
    if "A" in stages:
        print("Stage A — k=1 step select forms", flush=True)
        stage_a()
    if "B" in stages:
        print("Stage B — leaf emit scatter forms", flush=True)
        stage_b()
    if "C" in stages:
        print("Stage C — fused-emit scatter pattern", flush=True)
        stage_c()


if __name__ == "__main__":
    main()
