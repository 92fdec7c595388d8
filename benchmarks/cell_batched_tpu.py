"""C5 batched-eval on the real TPU: cell-major GEMMs vs grouped path.

BASELINE C5: rank-4 dim-100, B = 1024 inputs. Round 1 recorded 2.3 ms
(2.25 us/input, 3.9 TFLOP/s) on the grouped path — HBM-bound on its
(B, sum_j T_j) triangle intermediate (~0.7 GB). The cell-major kernel
(kernels/cell_gemm.py) removes that intermediate entirely.

Usage:  python benchmarks/cell_batched_tpu.py [rank dim B]
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

    import symtensor_tpu as st
    from symtensor_tpu.kernels.cell_gemm import poly_eval_cell_batched
    from symtensor_tpu.kernels.poly_eval import (
        poly_eval_flat_batched_fast,
        group_views,
        _views_eval_batched_jitted,
    )

    assert jax.devices()[0].platform == "tpu", "needs the real TPU"
    rank = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    out = {"rank": rank, "dim": dim, "B": B}

    def floor_time():
        tiny = jax.jit(lambda v: v + 1.0)
        float(tiny(jnp.zeros(())))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(tiny(jnp.zeros(())))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    FLOOR = floor_time()
    out["floor_ms"] = round(FLOOR * 1e3, 2)

    def dev_time(fn, K=8):
        """Adaptive: grow K until the chained-dispatch total dominates the
        readback floor (a 5-call chain of a ~2 ms op hides entirely inside
        the ~30 ms tunnel roundtrip and reads as ~0)."""
        float(jnp.sum(fn()))  # compile + warm

        def run(K):
            t0 = time.perf_counter()
            acc = None
            for _ in range(K):
                r = jnp.sum(fn())
                acc = r if acc is None else acc + r
            float(acc)
            return time.perf_counter() - t0

        total = run(K)
        while total < 5 * FLOOR and K < 4096:
            K *= 4
            total = run(K)
        return max((total - FLOOR) / K, 1e-9)

    n = st.utils.indep_size(rank, dim)
    key = jax.random.PRNGKey(0)
    A = st.FlatSymmetricTensor._raw(
        rank, dim, jax.random.normal(key, (n,), jnp.float32)
    )
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, dim), jnp.float32)

    # correctness cross-check on-chip
    got = np.asarray(poly_eval_cell_batched(A, xs[:8]))
    views = group_views(A)
    grouped = _views_eval_batched_jitted(rank, dim)
    ref = np.asarray(grouped(views, xs[:8]))
    out["cell_vs_grouped_relerr"] = float(
        np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    )

    t_cell = dev_time(lambda: poly_eval_cell_batched(A, xs))
    out["cell_ms"] = round(t_cell * 1e3, 3)
    out["cell_us_per_input"] = round(t_cell / B * 1e6, 3)
    flops = 2.0 * B * n
    out["cell_tflops"] = round(flops / t_cell / 1e12, 2)

    t_grp = dev_time(lambda: grouped(views, xs))
    out["grouped_ms"] = round(t_grp * 1e3, 3)
    out["speedup_vs_grouped"] = round(t_grp / t_cell, 2)

    # premultiplied grouped views (the production non-cell route)
    from symtensor_tpu.kernels.poly_eval import (
        group_views_premul,
        _views_eval_batched_premul_jitted,
    )

    pviews = group_views_premul(A)
    premul = _views_eval_batched_premul_jitted(rank, dim)
    gp = np.asarray(premul(pviews, xs[:8]))
    out["premul_vs_grouped_relerr"] = float(
        np.max(np.abs(gp - ref)) / np.max(np.abs(ref))
    )
    t_pre = dev_time(lambda: premul(pviews, xs))
    out["grouped_premul_ms"] = round(t_pre * 1e3, 3)

    # bf16 storage variant
    A16 = st.FlatSymmetricTensor._raw(rank, dim, A.data.astype(jnp.bfloat16))
    got16 = np.asarray(poly_eval_cell_batched(A16, xs[:8]))
    out["bf16_relerr"] = float(np.max(np.abs(got16 - ref)) / np.max(np.abs(ref)))
    t16 = dev_time(lambda: poly_eval_cell_batched(A16, xs))
    out["cell_bf16_ms"] = round(t16 * 1e3, 3)
    out["cell_bf16_tflops"] = round(flops / t16 / 1e12, 2)

    pviews16 = group_views_premul(A16)
    t_pre16 = dev_time(lambda: premul(pviews16, xs))
    out["grouped_premul_bf16_ms"] = round(t_pre16 * 1e3, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
