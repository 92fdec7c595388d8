"""VERDICT round-3 weak-item 6: batched f32 evaluation is 2x off its own
bf16 route because HIGHEST-precision f32 GEMMs cost 6 MXU passes.  The
untried middle is Precision.HIGH (3 passes - the Ah@Bh + Ah@Bl + Al@Bh
split-K decomposition done by the hardware itself): expected ~f32-level
accuracy at half the MXU cost of HIGHEST.

Measures, one process, rank-4 dim-100 B=1024 (the documented config,
docs/benchmarks.md "Batched evaluation"):
  - plain-views batched f32 at DEFAULT / HIGH / HIGHEST
    (via SYMTENSOR_VALUE_PRECISION + builder cache_clear between settings,
    the pattern from benchmarks/precision_probe.py)
  - premul-views batched bf16 (the fast reference point)
  - rel err of each vs the f64 CPU oracle

Decision rule: if HIGH is within ~1.2x of bf16 and rel err <= ~3e-6,
record it in docs/benchmarks.md as the recommended knob for
throughput-sensitive f32 batches (default stays HIGHEST for reference
parity - utils/precision.py).

Usage:  timeout 1800 python benchmarks/batched_f32_high_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    import symtensor_tpu as st
    from symtensor_tpu.kernels import poly_eval as pe
    from symtensor_tpu.utils import combinatorics as comb

    print("device:", jax.devices()[0], flush=True)
    floor = bench.sync_roundtrip_floor()
    print(f"readback floor {floor*1e3:.1f} ms", flush=True)

    r, d, B = 4, 100, 1024
    rng = np.random.default_rng(3)
    n = comb.indep_size(r, d)
    vals64 = rng.normal(size=(n,))
    xs64 = rng.normal(size=(B, d))

    # f64 oracle on CPU (batched eval itself, which is exact in f64)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        A64 = st.FlatSymmetricTensor._raw(r, d, jnp.asarray(vals64))
        oracle = np.asarray(pe.poly_eval_flat_batched(A64, jnp.asarray(xs64)))

    A32 = st.FlatSymmetricTensor._raw(
        r, d, jnp.asarray(vals64.astype(np.float32))
    )
    xs32 = jnp.asarray(xs64.astype(np.float32))
    A16 = st.FlatSymmetricTensor._raw(
        r, d, jnp.asarray(vals64.astype(np.float32)).astype(jnp.bfloat16)
    )

    def run(A, xs, label, reps=32):
        out = pe.poly_eval_flat_batched_fast(A, xs)
        _ = float(jnp.asarray(out)[0])  # fence incl. compile
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            o = jnp.sum(pe.poly_eval_flat_batched_fast(A, xs))
            acc = o if acc is None else acc + o
        _ = float(acc)
        dt = (time.perf_counter() - t0 - floor) / reps
        # scale-normalized error: |got - want| / max|want| (plain max-rel
        # explodes on the near-zero outputs of a random batch)
        rel = float(
            np.max(np.abs(np.asarray(out, np.float64) - oracle))
            / np.max(np.abs(oracle))
        )
        print(f"{label:34s} {dt*1e3:8.3f} ms   norm err {rel:.3e}",
              flush=True)
        return dt, rel

    def clear_caches():
        pe._views_eval_batched_jitted.cache_clear()
        pe._views_eval_batched_premul_jitted.cache_clear()

    for setting in ("highest", "high", "default"):
        os.environ["SYMTENSOR_VALUE_PRECISION"] = setting
        clear_caches()
        run(A32, xs32, f"f32 plain views  prec={setting}")
    os.environ.pop("SYMTENSOR_VALUE_PRECISION", None)
    clear_caches()
    run(A16, xs32, "bf16 premul views (reference pt)")


if __name__ == "__main__":
    main()
