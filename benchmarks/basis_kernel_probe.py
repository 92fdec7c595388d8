"""Attribute basis-change time: run ONE step kernel per level at exact
rank-5 dim-100 flagship shapes, isolated, on the real TPU.

The flagship rank-5 pass measures 229.5 s but a slice-issue-rate model
predicts ~6 s, so something else dominates (in-kernel ranking sort,
Pascal-table gathers, select, lax.map overhead, …).  This times the real
`_step_kernel` per level plus stripped variants of its stages.

Usage:  python benchmarks/basis_kernel_probe.py [rank dim]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from symtensor_tpu.config import config
    from symtensor_tpu.ops import basis_change as bc
    from symtensor_tpu.utils import combinatorics as comb
    from symtensor_tpu.utils.tables import tables

    rank = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    levels = (
        [int(x) for x in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else list(range(rank))
    )
    config.max_table_entries = 3_000_000_000
    out = {"rank": rank, "dim": d, "device": str(jax.devices()[0])}

    n_full = comb.indep_size(rank, d)
    # match benchmarks/basis_change_flagship.py
    store_dt = "bfloat16" if n_full > 200_000_000 else "float32"
    acc_dt = "float32"
    block_elems = 2_000_000_000
    transient_elems = 50_000_000
    onthefly_above = 250_000_000

    widths = [comb.indep_size(rank - t, d) for t in range(rank + 1)]
    R = bc._row_budgets(rank, d, widths, block_elems)
    w_pad = [None] * (rank + 1)
    prevR = 1
    for t in range(1, rank + 1):
        w_pad[t] = int(min(d, max(4, -(-2 * R[t] // prevR))))
        prevR = R[t]
    out["R"] = R[1:]
    out["w_pad"] = w_pad[1:]

    Wdev = jax.random.normal(
        jax.random.PRNGKey(2), (d, d + max(w_pad[1:])), jnp.float32
    )

    def fence(x):
        return float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))

    # readback floor: fencing an already-materialized scalar
    _z = jnp.zeros(())
    fence(_z)
    _t0 = time.time()
    fence(_z)
    FLOOR = time.time() - _t0

    def timeit(fn, k=3):
        fn()  # compile
        r0 = fn()
        fence(r0)  # warm + drain
        t0 = time.time()
        for _ in range(k):
            r = fn()  # dispatches serialize on-device
        fence(r)
        return max((time.time() - t0 - FLOOR) / k, 0.0)

    # host->device upload rate through the tunnel: run_chunk uploads
    # sel_par/sel_b (Rc int32 each) and pos_pad (Rc int64) per chunk —
    # ~270 MB per leaf chunk at flagship sizes if the tunnel is slow,
    # this dominates everything
    up = np.arange(16_777_216, dtype=np.int64)  # 134 MB
    t0 = time.time()
    dev = jnp.asarray(up)
    fence(dev[:1])
    t_up = time.time() - t0
    t0 = time.time()
    dev2 = jnp.asarray(up)
    fence(dev2[:1])
    out["upload_134MB_s"] = round(time.time() - t0, 3)
    out["upload_134MB_first_s"] = round(t_up, 3)

    # tunnel LATENCY: tiny uploads (the per-chunk group descriptors) and
    # tiny jitted dispatches — if either blocks ~100s of ms, the ~16
    # chunks per fence window explain the unattributed wall clock
    small = np.arange(300, dtype=np.int32)
    devs = [jnp.asarray(small + i) for i in range(2)]  # warm path
    fence(devs[-1][:1])
    t0 = time.time()
    devs = [jnp.asarray(small + i) for i in range(10)]
    fence(devs[-1][:1])
    out["small_upload_ms"] = round((time.time() - t0 - FLOOR) / 10 * 1e3, 1)

    tinyf = jax.jit(lambda v: v * 2 + 1)
    r = tinyf(devs[0])
    fence(r[:1])
    t0 = time.time()
    for _ in range(20):
        r = tinyf(r)
    fence(r[:1])
    out["tiny_dispatch_ms"] = round((time.time() - t0 - FLOOR) / 20 * 1e3, 1)
    print(json.dumps({
        "upload": out["upload_134MB_s"],
        "small_upload_ms": out["small_upload_ms"],
        "tiny_dispatch_ms": out["tiny_dispatch_ms"],
    }), flush=True)

    for t in levels:
        k = rank - t - 1
        n_k = comb.indep_size(k, d)
        npar = R[t] if t > 0 else 1
        wp = w_pad[t + 1]
        Rc = R[t + 1]
        fly = n_k * d > onthefly_above
        # transient cost model mirrors basis_change_packed
        cost = npar * (d + max(wp, 128)) + 2 * max(Rc, 128)
        if fly:
            cost += d * (k + 1) * 6
        seg = int(max(1, min(n_k, transient_elems // max(1, cost))))
        nseg = -(-n_k // seg)

        width_par = widths[t]
        buf = jax.random.normal(
            jax.random.PRNGKey(t), (int(npar) * int(width_par),),
            jnp.bfloat16,
        )
        if fly:
            rep_np = tables(k, d).rep_np()
            dt = np.int8 if d <= 127 else np.int16
            tbl_arg = jnp.asarray(rep_np.astype(dt).reshape(-1))
        else:
            tbl_arg = tables(rank, d).insert_table(k)
        rng = np.random.default_rng(t)
        # group descriptors (post-rewrite kernel signature): one run of
        # parents per b in the window, covering ≤ Rc children
        nb = max(1, min(wp, Rc // max(1, int(npar))))
        per = min(int(npar), Rc // nb)
        desc = np.zeros((3, wp), np.int32)
        for i in range(nb):
            desc[0, i], desc[1, i], desc[2, i] = i, 0, per
        dd = jnp.asarray(desc)

        kern = bc._step_kernel(
            int(npar), (int(buf.shape[0]),), int(n_k), d, k, wp, Rc,
            seg, store_dt, acc_dt, fly, None,
        )
        tm = timeit(lambda: kern(
            (buf,), tbl_arg, Wdev, 0, dd[0], dd[1], dd[2]
        ))
        key = f"L{t}to{t+1}"
        out[key] = {
            "n_k": n_k, "npar": int(npar), "seg": seg, "nseg": nseg,
            "onthefly": fly, "wp": wp, "kern_s": round(tm, 3),
        }

        # stripped variants at the same shapes (single lax.map program)
        if fly:
            t_kp1 = tables(k + 1, d)

            def rank_only(tbl=tbl_arg, seg=seg, nseg=nseg, k=k,
                          t_kp1=t_kp1):
                pad = nseg * seg - n_k
                tb = jnp.concatenate(
                    [tbl, jnp.zeros((pad * k,), tbl.dtype)]
                ).reshape(nseg, seg * k)

                def body(tseg):
                    rep_T = tseg.reshape(seg, k).astype(jnp.int32).T
                    full_T = jnp.concatenate(
                        [
                            jnp.broadcast_to(
                                rep_T[:, :, None], (k, seg, d)
                            ),
                            jnp.broadcast_to(
                                jnp.arange(d, dtype=jnp.int32)[
                                    None, None, :
                                ],
                                (1, seg, d),
                            ),
                        ],
                        axis=0,
                    )
                    full_T = jnp.sort(full_T, axis=0)
                    sl = t_kp1.position_jnp_T(full_T)
                    return jnp.sum(sl, axis=1)

                return jax.lax.map(body, tb)

            f = jax.jit(rank_only)
            out[key]["rank_only_s"] = round(timeit(lambda: f()), 3)

        # gather-only at the same slice shape
        idx = jnp.asarray(
            rng.integers(0, width_par, (nseg, seg * d), np.int64).astype(
                np.int32
            )
        )

        def gather_only(buf=buf, idx=idx, npar=int(npar), seg=seg):
            def body(sl):
                if npar == 1:
                    return jnp.sum(
                        buf[sl].astype(jnp.float32).reshape(seg, d),
                        axis=1,
                    )
                starts = (sl * npar)[:, None]
                G = jax.lax.gather(
                    buf,
                    starts,
                    jax.lax.GatherDimensionNumbers(
                        offset_dims=(0,),
                        collapsed_slice_dims=(),
                        start_index_map=(0,),
                    ),
                    slice_sizes=(npar,),
                ).astype(jnp.float32)
                return jnp.sum(G.reshape(npar, seg, d), axis=(0, 2))

            return jax.lax.map(body, idx)

        g = jax.jit(gather_only)
        out[key]["gather_only_s"] = round(timeit(lambda: g()), 3)

        if t == rank - 1:
            # leaf emit kernel at the same shapes
            n_out_f = comb.indep_size(rank, d)
            out_buf = jnp.zeros((n_out_f + 1,), jnp.dtype(store_dt))
            vals = jax.random.normal(
                jax.random.PRNGKey(9), (Rc,), jnp.dtype(store_dt)
            )
            reps_flat = jnp.asarray(
                np.sort(
                    rng.integers(0, d, (int(npar), rank - 1)), axis=1
                ).astype(np.int8).reshape(-1)
            )

            # donation consumes out_buf; rebuild per call outside timing
            ek = bc._emit_kernel2(rank, d, n_out_f, Rc, store_dt)
            bufs = [jnp.zeros((n_out_f + 1,), jnp.dtype(store_dt))
                    for _ in range(6)]
            r0 = ek(bufs[0], vals, reps_flat, dd[0], dd[1], dd[2])
            fence(r0)
            t0 = time.time()
            for bi in range(1, 5):
                r0 = ek(bufs[bi], vals, reps_flat, dd[0], dd[1], dd[2])
            fence(r0)
            out[key]["emit_s"] = round(
                max((time.time() - t0 - FLOOR) / 4, 0.0), 3
            )
        print(json.dumps({key: out[key]}), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
