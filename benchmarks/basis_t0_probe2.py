"""Second-stage bisection of the rank-6 t=0 TPU worker fault.

basis_t0_probe.py localized the fault: the production t=0 step kernel
passes at 7,424 map steps (161 MB stacked output) and crashes at the
full 59,408 steps, where the `lax.map` stacked output is
59408·7·1548 bf16 = 1.29 GB > 2^30 bytes.  This probe separates the
two candidate regimes:

  A  full 59,408 steps, but each map body reduces its (7, seg) output
     over seg — tiny stacked output.  Isolates "trip count / table
     size" from "big stacked buffer".  Body compute (2-piece masked
     gather + insert ranking + GEMM + select) is IDENTICAL to
     production up to the final reduction.
  B  production kernel at 48,000 steps (stack 0.97 GiB < 2^30)
  C  production kernel at 52,000 steps (stack 1.05 GiB > 2^30)

If A+B pass and C crashes, the fault is a >2^30-byte buffer in the
map-stack/transpose assembly — fix = chunk the t=0 column axis at the
host level (or assemble in pieces) keeping every buffer under 2^30.

Usage:  python benchmarks/basis_t0_probe2.py [A B C ...]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from symtensor_tpu.config import config
    from symtensor_tpu.ops.basis_change import _step_kernel
    from symtensor_tpu.utils.tables import tables

    config.max_table_entries = 3_000_000_000

    stages = [a.upper() for a in sys.argv[1:]] or ["A", "B", "C"]

    d, k = 100, 5
    seg = 1548
    n_k_full = 91_962_520
    piece_len = 804_672_050
    w_pad, nsel_pad = 14, 7

    print(f"device={jax.devices()[0]} stages={stages}", flush=True)

    t0 = time.time()
    rep_np = tables(k, d).rep_np().astype(np.int8).reshape(-1)
    print(f"host rep table built in {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    p1 = jnp.zeros((piece_len,), jnp.bfloat16)
    p2 = jnp.zeros((piece_len,), jnp.bfloat16)
    Wm = jnp.zeros((d, d + w_pad), jnp.float32)
    float(jnp.sum(p1[:4]).astype(jnp.float32))
    print(f"pieces resident in {time.time()-t0:.1f}s", flush=True)

    bs = jnp.asarray(
        np.pad(np.arange(nsel_pad, dtype=np.int32), (0, w_pad - nsel_pad))
    )
    starts = jnp.zeros((w_pad,), jnp.int32)
    counts = jnp.asarray(
        np.pad(np.ones(nsel_pad, np.int32), (0, w_pad - nsel_pad))
    )

    t6 = tables(k + 1, d)

    def reduced_kernel(n_k):
        """Production seg_body compute, seg-reduced map output."""
        nseg = -(-n_k // seg)
        n_k_pad = nseg * seg
        acc_dt = jnp.float32

        def kern(pieces, tbl, Wm, b_lo, bs, starts, counts):
            from symtensor_tpu.ops.basis_change import _expand_groups

            sel_par, sel_b_abs, _ = _expand_groups(
                bs, starts, counts, nsel_pad
            )
            sel_b = jnp.clip(sel_b_abs - b_lo, 0, w_pad - 1)
            Wc = jax.lax.dynamic_slice(Wm, (0, b_lo), (d, w_pad))
            pad = n_k_pad - n_k
            if pad:
                tbl = jnp.concatenate([tbl, jnp.zeros((pad * k,), tbl.dtype)])
            tbl = tbl.reshape(nseg, seg * k)

            def seg_body(tseg):
                rep_T = tseg.reshape(seg, k).astype(jnp.int32).T
                sl = t6.position_insert_jnp_T(rep_T)
                acc = jnp.zeros(sl.shape, acc_dt)
                off = 0
                for piece in pieces:
                    L = piece.shape[0]
                    loc = sl - off
                    m = (loc >= 0) & (loc < L)
                    acc = acc + jnp.where(
                        m,
                        piece[jnp.clip(loc, 0, L - 1)].astype(acc_dt),
                        jnp.zeros((), acc_dt),
                    )
                    off += L
                H = jax.lax.dot_general(
                    acc[None], Wc, (((2,), (0,)), ((), ())),
                    preferred_element_type=acc_dt,
                )  # (1, seg, wp)
                H2 = jnp.transpose(H, (0, 2, 1))
                st_idx = jnp.stack([sel_par, sel_b], axis=1)
                sel = jax.lax.gather(
                    H2, st_idx,
                    jax.lax.GatherDimensionNumbers(
                        offset_dims=(1,),
                        collapsed_slice_dims=(0, 1),
                        start_index_map=(0, 1),
                    ),
                    slice_sizes=(1, 1, seg),
                )  # (nsel_pad, seg)
                return jnp.sum(sel, axis=1)  # (nsel_pad,) — REDUCED

            return jnp.sum(jax.lax.map(seg_body, tbl), axis=0)

        return jax.jit(kern)

    caps = {"A": None, "B": 48_000 * seg, "C": 52_000 * seg}
    for stage in stages:
        if stage == "A":
            n_k = n_k_full
            kern = reduced_kernel(n_k)
            label = "reduced-assembly full length"
        else:
            n_k = min(caps[stage], n_k_full)
            kern = _step_kernel(
                1, (piece_len, piece_len), n_k, d, k, w_pad, nsel_pad,
                seg, "bfloat16", "float32", True, None,
            )
            label = "production kernel"
        tbl = jnp.asarray(rep_np[: n_k * k])
        print(f"{stage}: {label} n_k={n_k:,} ({-(-n_k//seg):,} steps) "
              "dispatch...", flush=True)
        t0 = time.time()
        out = kern((p1, p2), tbl, Wm, 0, bs, starts, counts)
        val = float(jnp.asarray(out.reshape(-1)[:1]).astype(jnp.float32)[0])
        print(f"{stage}: OK val={val} in {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
