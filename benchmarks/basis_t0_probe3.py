"""Third-stage bisection: the windowed t=0 flagship still crashed, but
only AFTER every window kernel passed its fence — the failing step is
one of the two ops unique to the windowed path:

  slice    device-side slicing of the resident 460 MB int8 rep table
           (probes always uploaded pre-sliced host tables; production
           windowing slices on device)
  combine  the window reassembly: concat of 10 bf16 (7, ~9.2M) blocks
           into (7, 91,962,520) = 1.29 GB
  dus      fallback assembly via donated dynamic_update_slice — run
           only if combine crashes, as the replacement candidate

Each stage is fenced; run order least-suspect-first so one process
yields maximum information before a crash.

Usage:  python benchmarks/basis_t0_probe3.py [slice combine dus ...]
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
    from symtensor_tpu.utils.tables import tables

    config.max_table_entries = 3_000_000_000

    stages = [a.lower() for a in sys.argv[1:]] or ["slice", "combine"]

    d, k = 100, 5
    n_k = 91_962_520
    nsel_pad = 7
    win_cols = 9_198_216
    bounds = [
        (c0, min(c0 + win_cols, n_k)) for c0 in range(0, n_k, win_cols)
    ]
    nkws = [c1 - c0 for c0, c1 in bounds]
    print(f"device={jax.devices()[0]} stages={stages} "
          f"windows={nkws}", flush=True)

    for stage in stages:
        t0 = time.time()
        if stage == "slice":
            rep_np = tables(k, d).rep_np().astype(np.int8).reshape(-1)
            tbl = jnp.asarray(rep_np)
            del rep_np
            float(jnp.sum(tbl[:8].astype(jnp.int32)).astype(jnp.float32))
            print(f"  table resident ({tbl.nbytes/1e6:.0f} MB) "
                  f"in {time.time()-t0:.1f}s", flush=True)
            for w, (c0, c1) in enumerate(bounds):
                t1 = time.time()
                sl = tbl[c0 * k : c1 * k]
                v = float(
                    jnp.sum(sl[:64].astype(jnp.int32)).astype(jnp.float32)
                )
                print(f"  slice w{w} [{c0*k}:{c1*k}] OK v={v} "
                      f"in {time.time()-t1:.1f}s", flush=True)
            del tbl
            print(f"slice: ALL OK in {time.time()-t0:.1f}s", flush=True)
        elif stage == "combine":
            from symtensor_tpu.ops.basis_change import _combine_windows

            outs = [
                jnp.zeros((nsel_pad * nkw,), jnp.bfloat16) for nkw in nkws
            ]
            float(jnp.sum(outs[0][:4]).astype(jnp.float32))
            comb_fn = _combine_windows(
                nsel_pad, tuple(nkws), "bfloat16"
            )
            out = comb_fn(*outs)
            v = float(jnp.asarray(out[-1]).astype(jnp.float32))
            print(f"combine: OK v={v} out={out.shape} "
                  f"in {time.time()-t0:.1f}s", flush=True)
            del outs, out
        elif stage == "dus":
            import functools

            @functools.partial(
                jax.jit, donate_argnums=(0,), static_argnums=(2, 3)
            )
            def put(buf, piece, c0, nkw):
                return jax.lax.dynamic_update_slice(
                    buf, piece.reshape(nsel_pad, nkw), (0, c0)
                )

            buf = jnp.zeros((nsel_pad, n_k), jnp.bfloat16)
            for (c0, c1), nkw in zip(bounds, nkws):
                piece = jnp.zeros((nsel_pad * nkw,), jnp.bfloat16)
                buf = put(buf, piece, c0, nkw)
                float(jnp.asarray(buf[0, c0]).astype(jnp.float32))
            print(f"dus: OK in {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
