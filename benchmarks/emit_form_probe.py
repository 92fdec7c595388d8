"""Probe: fused leaf-emit window width at exact rank-5 dim-100 shapes.

The warm rank-5 flagship pass spends ~26 s in 64 fused leaf emits
(~0.4 s each, fenced).  Each emit computes the FULL (npar, wp) product
grid regardless of validity and scatters npar·wp slots, with the H tile
lane-padded to 128 columns — so widening wp from the default 8 to ~100
costs the same H bytes while collapsing ~13 dispatches into one.
Whether that wins depends on what the 0.4 s is:

  - per-op fixed cost (dispatch + fence drain)  → wide window ~13× better
  - scatter slot-rate bound (~20 M slots/s)     → wide window neutral

Variants (exact production kernel, ops/basis_change._fused_leaf_emit):
  A: 13 sequential emits wp=8   (today's schedule for one 922k block)
  B: 1 emit wp=104              (proposed: whole-width window)
  C: B with unique_indices=True (scatter upper bound; timing only)

Usage: python benchmarks/emit_form_probe.py  (real TPU)
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
    return float(jnp.asarray(x).reshape(-1)[0])


def main():
    r, d, d_out = 5, 100, 100
    npar = 922_057  # the largest rank-5 leaf-parent block in the flagship
    n_out = comb.indep_size(r, d_out)
    rng = np.random.default_rng(0)

    # realistic sorted (r-1)-tuples for the closed-form base ranking
    reps = np.sort(rng.integers(0, d_out, size=(npar, r - 1)), axis=1)
    reps_flat = jnp.asarray(
        np.ascontiguousarray(reps.T.astype(np.int8)).reshape(-1)
    )
    rows_flat = jnp.asarray(rng.standard_normal(npar * d), jnp.float32)
    Wdev = jnp.asarray(
        np.concatenate(
            [rng.standard_normal((d, d_out)), np.zeros((d, 128))], axis=1
        ),
        jnp.float32,
    )
    out0 = jnp.zeros((n_out + bc._DUMP_SLOTS,), jnp.float32)
    fence(out0[:1])
    print(f"npar={npar} n_out={n_out:,}; buffers resident", flush=True)

    def starts_counts(wp, jlo):
        # staircase validity like production: column j valid for a prefix
        # of parents that grows with b = jlo + j
        st = np.zeros(wp, np.int32)
        ct = np.minimum(
            npar, ((np.arange(wp) + jlo + 1) * npar) // d_out
        ).astype(np.int32)
        return jnp.asarray(st), jnp.asarray(ct)

    def time_variant(name, kern, calls, reps_n=3):
        nonlocal out0
        # warm (compile) once
        t0 = time.time()
        for args in calls:
            out0 = kern(out0, rows_flat, Wdev, *args)
        fence(out0[-1])
        print(f"{name}: first (incl. compile) {time.time()-t0:.2f}s",
              flush=True)
        best = 1e30
        for _ in range(reps_n):
            t0 = time.time()
            for args in calls:
                out0 = kern(out0, rows_flat, Wdev, *args)
            fence(out0[-1])
            best = min(best, time.time() - t0)
        slots = len(calls) * npar * calls[0][1].shape[0]
        print(
            f"{name}: best {best*1e3:.1f} ms  "
            f"({slots/1e6:.1f}M slots → {slots/best/1e6:.0f} M slots/s)",
            flush=True,
        )
        return best

    # A: today's 13 narrow windows
    kern8 = bc._fused_leaf_emit(
        r, d, d_out, n_out, npar, 8, "float32", "float32"
    )
    calls_a = []
    for b_lo in range(0, d_out, 8):
        st, ct = starts_counts(8, b_lo)
        calls_a.append((jnp.int32(b_lo), st, ct, reps_flat))
    t_a = time_variant("A wp=8 x13", kern8, calls_a)

    # B: one whole-width window
    kern104 = bc._fused_leaf_emit(
        r, d, d_out, n_out, npar, 104, "float32", "float32"
    )
    st, ct = starts_counts(104, 0)
    t_b = time_variant("B wp=104 x1", kern104, [(jnp.int32(0), st, ct,
                                                 reps_flat)])

    # C: unique-indices scatter upper bound (pads collide → results wrong;
    # timing only)
    t_out = tables(r, d_out)

    def kern_u(out, rf, Wm, b_lo, st_, ct_, repf):
        Wc = jax.lax.dynamic_slice(
            Wm, (jnp.int32(0), b_lo), (Wm.shape[0], 104)
        )
        rows2 = rf.reshape(npar, d)
        H = jax.lax.dot_general(
            rows2, Wc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rep = repf.reshape(r - 1, npar).astype(jnp.int32)
        base = t_out.position_base_jnp_T(rep)
        par = jnp.arange(npar, dtype=jnp.int32)[:, None]
        j = jnp.arange(104, dtype=jnp.int32)[None, :]
        valid = (par >= st_[None, :]) & (par < (st_ + ct_)[None, :])
        pos = base[:, None] + (b_lo + j)
        s = jnp.arange(npar * 104, dtype=jnp.int32)
        posf = jnp.where(
            valid.reshape(-1), pos.reshape(-1), n_out + s % bc._DUMP_SLOTS
        )
        return out.at[posf].set(H.reshape(-1), unique_indices=True)

    kern_uj = jax.jit(kern_u, donate_argnums=(0,))
    t_c = time_variant("C wp=104 unique", kern_uj,
                       [(jnp.int32(0), st, ct, reps_flat)])

    print(
        f"\nsummary: A(13x8)={t_a*1e3:.0f}ms  B(1x104)={t_b*1e3:.0f}ms  "
        f"C(unique)={t_c*1e3:.0f}ms  → wide-window speedup {t_a/t_b:.1f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
