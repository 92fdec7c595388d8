"""Measure the value_prec policy on the real chip: accuracy of the vmapped
eval (the bug this fixes) and the cost of HIGHEST vs DEFAULT on the batched
and single-input routes.

Stages are ordered least-likely-to-crash first and run in ONE process
(separate runs differ ±25% through the tunnel — CLAUDE.md).

Usage:  timeout 1800 python benchmarks/precision_probe.py
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

    print("device:", jax.devices()[0], flush=True)
    floor = bench.sync_roundtrip_floor()
    print(f"readback floor {floor*1e3:.1f} ms", flush=True)

    # ---- Stage A: vmapped accuracy at rank-4 dim-20 (the verify failure) --
    rng = np.random.default_rng(0)
    r, d = 4, 20
    from symtensor_tpu.testing.utils import random_symmetric

    dense = random_symmetric(r, d, rng=rng)
    A = st.FlatSymmetricTensor.from_dense(dense.astype(np.float32))
    xs = rng.normal(size=(4, d)).astype(np.float32)
    from symtensor_tpu import symalg

    f = jax.jit(
        lambda xb: jax.vmap(
            lambda xi: symalg.contract_all_indices_with_vector(A, xi)
        )(xb)
    )
    jv = np.asarray(f(jnp.asarray(xs)))
    orac = []
    for i in range(4):
        o = dense
        for _ in range(r):
            o = np.tensordot(o, xs[i].astype(np.float64), axes=([0], [0]))
        orac.append(float(o))
    rel = [abs(jv[i] - orac[i]) / abs(orac[i]) for i in range(4)]
    print(f"A: vmapped rel err (HIGHEST default): {max(rel):.2e}", flush=True)

    # ---- Stage B: batched B=1024 rank-4 dim-100, HIGHEST vs DEFAULT ------
    r, d, B = 4, 100, 1024
    n = st.utils.indep_size(r, d)
    key = jax.random.PRNGKey(0)
    vals = jax.random.normal(key, (n,), jnp.float32)
    Af = st.FlatSymmetricTensor._raw(r, d, vals)
    xb = jax.random.normal(jax.random.PRNGKey(1), (B, d), jnp.float32)

    def timed_batched(label):
        pe._views_eval_batched_jitted.cache_clear()
        views = pe.group_views(Af)
        fn = pe._views_eval_batched_jitted(r, d)
        t = bench.device_time(lambda: fn(views, xb), 5, floor)
        out = np.asarray(fn(views, xb))
        print(f"B: batched {label}: {t*1e3:.3f} ms  (sum={out.sum():.4f})",
              flush=True)
        return t, out

    os.environ.pop("SYMTENSOR_VALUE_PRECISION", None)
    t_hi, out_hi = timed_batched("HIGHEST (new default)")
    os.environ["SYMTENSOR_VALUE_PRECISION"] = "high"
    t_hi3, out_hi3 = timed_batched("HIGH (bf16_3x)")
    os.environ["SYMTENSOR_VALUE_PRECISION"] = "default"
    t_def, out_def = timed_batched("DEFAULT (bf16)")
    os.environ.pop("SYMTENSOR_VALUE_PRECISION", None)
    rel_def = float(np.max(np.abs(out_def - out_hi) / np.abs(out_hi)))
    rel_hi3 = float(np.max(np.abs(out_hi3 - out_hi) / np.abs(out_hi)))
    print(f"B: rel err DEFAULT vs HIGHEST: {rel_def:.2e}; "
          f"HIGH vs HIGHEST: {rel_hi3:.2e}", flush=True)

    # ---- Stage C: single-input premul route (headline path, smaller size) -
    def timed_single(label):
        pe._views_eval_premul_jitted.cache_clear()
        views = pe.group_views_premul(Af)
        fn = pe._views_eval_premul_jitted(r, d)
        t = bench.device_time(lambda: fn(views, xb[0]), 10, floor)
        print(f"C: single {label}: {t*1e3:.3f} ms", flush=True)
        return t

    timed_single("HIGHEST (new default)")
    os.environ["SYMTENSOR_VALUE_PRECISION"] = "default"
    timed_single("DEFAULT (bf16)")
    os.environ.pop("SYMTENSOR_VALUE_PRECISION", None)


if __name__ == "__main__":
    main()
