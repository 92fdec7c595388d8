"""Chipless per-device memory proof: f32 rank-6 dim-100 on a 2-device mesh.

VERDICT r4 item 2: docs/benchmarks.md argued f32-at-rank-6 fits 2 devices
("A/2 + C/2 with ordinary headroom") from residency arithmetic, verified
numerically only at dim 24.  This script replaces the estimate with
compiled numbers, chiplessly:

1. CAPTURE (CPU, fake kernels — schedule_sim style): run the REAL mesh
   scheduling of ``basis_change_packed(A, W, mesh=...)`` at rank-6
   dim-100 f32 on a 2-virtual-device mesh, recording every step/emit
   program signature the schedule dispatches plus the resident-array
   ledger (root shard, sharded output, level blocks).

2. COMPILE (still chipless): for the heaviest distinct signatures,
   build the real kernels and ``jit(...).lower(shaped, sharded).
   compile().memory_analysis()`` on the 2-device CPU mesh — XLA's own
   per-device argument/output/temp byte counts for the GSPMD-partitioned
   programs.  (The one real TPU chip cannot host a 2-device mesh; CPU
   partitioning proves the per-device SHAPES — TPU lane-padding hazards
   for these same kernels are covered by the bf16 flagship that runs
   them on the chip daily.)

Usage: XLA needs the device count before jax import, so run as
    python benchmarks/f32_rank6_mem.py [rank dim]
(defaults 6 100; takes a few minutes, ~20 GB host RAM).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import symtensor_tpu  # noqa: F401
from symtensor_tpu.core.flat import FlatSymmetricTensor
from symtensor_tpu.ops import basis_change as bc
from symtensor_tpu.utils import combinatorics as comb

NDEV = 2
STEPS = []   # recorded _step_kernel signatures
EMITS = []   # recorded sharded-emit signatures


def _fz(shape, dt):
    return np.broadcast_to(np.dtype(dt).type(0), shape)


def patch():
    def fake_step(npar, piece_lens, n_k, d, k, wp, nsel_pad, seg,
                  store_dt, acc_dt, onthefly, mesh_axis=None):
        sig = dict(npar=npar, piece_lens=tuple(piece_lens), n_k=n_k, d=d,
                   k=k, wp=wp, nsel_pad=nsel_pad, seg=seg,
                   store_dt=store_dt, acc_dt=acc_dt, onthefly=onthefly,
                   sharded=mesh_axis is not None)

        def kern(rows_pieces, tbl, Wm, b_lo, bs, st, ct):
            STEPS.append(sig)
            return _fz((nsel_pad * n_k,), store_dt)

        return kern

    bc._step_kernel = fake_step

    def fake_emit_sharded(r, d_out, n_out, nsel_pad, store_dt, mesh,
                          axis, base):
        sig = dict(r=r, d_out=d_out, n_out=n_out, nsel_pad=nsel_pad,
                   store_dt=store_dt, base=base)

        def kern(out, vals, reps_flat, bs, st, ct):
            EMITS.append(sig)
            return out

        return kern

    bc._emit_kernel2_sharded = fake_emit_sharded

    def fake_dus(nsel_pad, n_k, nkw, store_dt):
        def put(buf, piece, c0):
            return buf

        return put

    bc._dus_combine = fake_dus


def capture(rank, dim):
    from symtensor_tpu.config import config

    config.max_table_entries = 3_000_000_000
    mesh = Mesh(np.array(jax.devices()[:NDEV]).reshape(NDEV), ("tp",))
    n = comb.indep_size(rank, dim)
    A = FlatSymmetricTensor._raw(rank, dim, jnp.zeros((n,), jnp.float32))
    W = jnp.eye(dim, dtype=jnp.float32)
    patch()
    C = bc.basis_change_packed(
        A, W,
        mesh=mesh,
        store_dtype=jnp.float32,
        block_elems=int(os.environ.get(
            "SYMTENSOR_FLAGSHIP_BLOCK_ELEMS", 1_900_000_000)),
        transient_elems=int(os.environ.get(
            "SYMTENSOR_FLAGSHIP_TRANSIENT_ELEMS", 50_000_000)),
        onthefly_above=250_000_000,
    )
    return mesh, n, C


def fmt(b):
    return f"{b/2**30:6.2f} GiB"


def compile_signatures(mesh, top=8):
    import importlib

    importlib.reload(bc)  # restore the real kernels after patch()
    seen = {}
    for s in STEPS:
        key = tuple(sorted(s.items(), key=lambda kv: kv[0]))
        seen.setdefault(key, dict(s, count=0))["count"] += 1
    # rank by estimated footprint: parent bytes + output bytes + workspace
    def est(s):
        isz = 4
        return (sum(s["piece_lens"]) + s["nsel_pad"] * s["n_k"]
                + s["npar"] * s["seg"] * s["d"]) * isz

    sigs = sorted(seen.values(), key=est, reverse=True)[:top]
    rows = []
    for s in sigs:
        mesh_axis = (mesh, "tp") if s["sharded"] else None
        kern = bc._step_kernel(
            s["npar"], s["piece_lens"], s["n_k"], s["d"], s["k"],
            s["wp"], s["nsel_pad"], s["seg"], s["store_dt"], s["acc_dt"],
            s["onthefly"], mesh_axis,
        )
        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("tp"))
        rows_sh = tuple(
            jax.ShapeDtypeStruct(
                (L,), s["store_dt"],
                sharding=shard if (s["sharded"] and s["npar"] == 1
                                   and len(s["piece_lens"]) == 1
                                   and L % NDEV == 0) else repl,
            )
            for L in s["piece_lens"]
        )
        if s["onthefly"]:
            it = (np.int8 if s["d"] <= 127
                  else np.int16 if s["d"] <= 32767 else np.int32)
            tbl = jax.ShapeDtypeStruct(
                (s["n_k"] * s["k"],), it, sharding=repl)
        else:
            tbl = jax.ShapeDtypeStruct(
                (s["n_k"], s["d"]), np.int32, sharding=repl)
        wmax = s["wp"] + 128
        Wm = jax.ShapeDtypeStruct(
            (s["d"], s["d"] + wmax), s["acc_dt"], sharding=repl)
        i32 = lambda shape=(): jax.ShapeDtypeStruct(  # noqa: E731
            shape, np.int32, sharding=repl)
        nb = 128  # descriptor pad (upper bound; tiny either way)
        try:
            lowered = kern.lower(
                rows_sh, tbl, Wm, i32(), i32((nb,)), i32((nb,)), i32((nb,))
            )
            compiled = lowered.compile()
            ma = compiled.memory_analysis()
            rows.append((s, ma))
            print(
                f"step k={s['k']} npar={s['npar']} n_k={s['n_k']:>9} "
                f"seg={s['seg']:>8} x{s['count']:>4} "
                f"{'SHARDED-ROOT' if s['sharded'] and s['npar']==1 else 'col-sharded'}: "
                f"args={fmt(ma.argument_size_in_bytes)} "
                f"out={fmt(ma.output_size_in_bytes)} "
                f"temp={fmt(ma.temp_size_in_bytes)} ",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"step {s['k']}/{s['n_k']}: lower/compile failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    return rows


def main():
    rank = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n = comb.indep_size(rank, dim)
    print(f"rank={rank} dim={dim} f32: n = {n:,} "
          f"(A = {fmt(4*n)}, per-device shard {fmt(4*n//NDEV)})",
          flush=True)
    mesh, n, C = capture(rank, dim)
    print(f"capture: {len(STEPS)} step dispatches, {len(EMITS)} emits; "
          f"output sharded over tp: per-device {fmt(4 * C.data.size // NDEV)}",
          flush=True)
    print("\nper-program per-device memory (XLA memory_analysis, "
          "2-device GSPMD):", flush=True)
    compile_signatures(mesh)

    # resident ledger (per device)
    blocks = int(os.environ.get("SYMTENSOR_FLAGSHIP_BLOCK_ELEMS",
                                1_900_000_000))
    ledger = [
        ("root A shard (P('tp'))", 4 * n // NDEV),
        ("output C shard (P('tp'))", 4 * C.data.size // NDEV),
        ("level blocks (col-sharded over tp)", 4 * blocks // NDEV),
    ]
    tot = 0
    print("\nresident per-device ledger:", flush=True)
    for name, b in ledger:
        tot += b
        print(f"  {name:<38} {fmt(b)}")
    print(f"  {'total resident':<38} {fmt(tot)}  (+ largest program temp "
          "above; HBM budget 16 GB/device)")


if __name__ == "__main__":
    main()
