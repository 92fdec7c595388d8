"""Bisect the rank-6 dim-100 basis-change TPU worker fault (round-2 close).

The fenced flagship run (SYMTENSOR_BASIS_FENCE_EVERY=1) localized the
fault to the FIRST chunk of the t=0 root pass — the k=5 step kernel —
refuting both the "level 3/4 shape" reading of earlier async runs and
the transient≤2^22 hypothesis (seg was already 1548).  This probe calls
the production ``_step_kernel`` at the exact t=0 flagship signature
(npar=1, two 804,672,050-element bf16 root pieces, n_k=91,962,520,
k=5, w_pad=14, nsel_pad=7, seg=1548, on-the-fly int8 rep table) with
zeros data (gathers are data-independent), in stages:

  S1  n_k capped at 40 segments       — the shape class the old probe
                                        (basis_probe_tpu.py) passed
  S2  n_k capped at ~1/8 of full      — mid-scale map length
  S3  full n_k = 91,962,520           — the faulting production call

Each stage builds its own kernel signature and fences with a scalar
readback; the first stage to crash the worker identifies the regime.
Stage times are printed for the attribution doc.

Usage:  python benchmarks/basis_t0_probe.py [stage...]   (default: 1 2 3)
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

    config.max_table_entries = 3_000_000_000  # match the flagship run

    stages = [int(a) for a in sys.argv[1:]] or [1, 2, 3]

    d, k = 100, 5
    seg = 1548
    n_k_full = 91_962_520
    piece_len = 804_672_050
    w_pad, nsel_pad = 14, 7

    print(f"device={jax.devices()[0]} stages={stages}", flush=True)

    # real flat int8 rep table (the production upload): (n_k, 5) int8
    t0 = time.time()
    rep_np = tables(k, d).rep_np().astype(np.int8).reshape(-1)
    print(f"host rep table built in {time.time()-t0:.1f}s "
          f"({rep_np.nbytes/1e6:.0f} MB)", flush=True)

    t0 = time.time()
    p1 = jnp.zeros((piece_len,), jnp.bfloat16)
    p2 = jnp.zeros((piece_len,), jnp.bfloat16)
    Wm = jnp.zeros((d, d + w_pad), jnp.float32)
    float(jnp.sum(p1[:4]).astype(jnp.float32))
    print(f"pieces resident in {time.time()-t0:.1f}s", flush=True)

    # group descriptors of the real first chunk: 7 children (b, 0, 1)
    bs = jnp.asarray(
        np.pad(np.arange(nsel_pad, dtype=np.int32), (0, w_pad - nsel_pad))
    )
    starts = jnp.zeros((w_pad,), jnp.int32)
    counts = jnp.asarray(
        np.pad(np.ones(nsel_pad, np.int32), (0, w_pad - nsel_pad))
    )

    # stages 1-3 are the original bisection; any argument > 3 is taken
    # as a raw n_k value (e.g. 91962036 = 59407·seg, the pad-free
    # near-full shape that isolates the in-kernel 460 MB table
    # concatenate — n_k not a seg multiple adds a pad concat)
    caps = {1: 40 * seg, 2: 7424 * seg, 3: n_k_full}
    for stage in stages:
        n_k = min(caps.get(stage, stage), n_k_full)
        tbl = jnp.asarray(rep_np[: n_k * k])
        kern = _step_kernel(
            1, (piece_len, piece_len), n_k, d, k, w_pad, nsel_pad, seg,
            "bfloat16", "float32", True, None,
        )
        print(f"S{stage}: n_k={n_k:,} ({-(-n_k//seg):,} map steps) "
              "dispatch...", flush=True)
        t0 = time.time()
        out = kern((p1, p2), tbl, Wm, 0, bs, starts, counts)
        val = float(jnp.asarray(out[:1]).astype(jnp.float32)[0])
        print(f"S{stage}: OK val={val} in {time.time()-t0:.1f}s "
              f"(out shape {out.shape})", flush=True)


if __name__ == "__main__":
    main()
