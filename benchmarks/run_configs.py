"""Measure the five BASELINE.json configs (+ a bf16 storage variant) on the
attached device. Writes JSON lines to stdout; results are recorded in
docs/benchmarks.md.

Timing: dependent-dispatch batches with one scalar readback, minus the
measured readback floor (see bench.py — block_until_ready does not
synchronize through remotely-attached TPUs).
"""

import json
import time

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import symtensor_tpu as st
    from symtensor_tpu import symalg
    from symtensor_tpu.kernels.poly_eval import poly_eval_flat_fast

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

    def dev_time(fn, K=5):
        float(jnp.sum(fn()))
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            acc = None
            for _ in range(K):
                r = jnp.sum(fn())
                acc = r if acc is None else acc + r
            float(acc)
            ts.append(time.perf_counter() - t0)
        t = (min(ts) - FLOOR) / K
        # below the readback floor the measurement is meaningless: flag it
        return t if t > FLOOR * 0.05 / K else float("nan")

    out = {"device": str(jax.devices()[0]), "floor_ms": round(FLOOR * 1e3, 2)}
    key = jax.random.PRNGKey(0)

    # config 1: rank-3 dim-30 symalg ops vs einsum-equivalent sizes
    r, d = 3, 30
    n = st.utils.indep_size(r, d)
    A = st.FlatSymmetricTensor._raw(r, d, jax.random.normal(key, (n,), jnp.float32))
    B = st.FlatSymmetricTensor._raw(r, d, jax.random.normal(key, (n,), jnp.float32))
    f_outer = jax.jit(lambda a, b: symalg.multiply.outer(a, b).data)
    t = dev_time(lambda: f_outer(A, B))
    out["c1_outer_r3xr3_d30_ms"] = round(t * 1e3, 3)
    f_td = jax.jit(lambda a, b: symalg.tensordot(a, b, axes=1).data)
    t = dev_time(lambda: f_td(A, B))
    out["c1_tensordot_ax1_ms"] = round(t * 1e3, 3)

    # config 2: rank-4 dim-100 basis change
    r, d = 4, 100
    n = st.utils.indep_size(r, d)
    A4 = st.FlatSymmetricTensor._raw(r, d, jax.random.normal(key, (n,), jnp.float32))
    W = jax.random.normal(key, (d, d), jnp.float32) / 10.0
    f_bc = jax.jit(lambda a, w: symalg.contract_all_indices_with_matrix(a, w).data)
    t = dev_time(lambda: f_bc(A4, W), K=3)
    out["c2_basis_change_r4_d100_ms"] = round(t * 1e3, 2)
    out["c2_packed_vs_dense_memory"] = round(d**r / n, 1)

    # config 3: rank-6 dim-200 permcls with scalar classes (too big to densify)
    A6 = st.PermClsSymmetricTensor(
        rank=6, dim=200, data={"iiiiii": 0.5, "iijjkk": -0.25, "ijklmn": 2.0}
    )
    x200 = jax.random.normal(key, (200,), jnp.float32)
    f_sc = jax.jit(lambda x: symalg.contract_all_indices_with_vector(A6, x))
    t = dev_time(lambda: f_sc(x200))
    out["c3_scalar_class_eval_r6_d200_ms"] = round(t * 1e3, 3)

    # config 4: decomp contract_tensor_list over a 5-tensor moment hierarchy
    dim = 64
    Ad = st.DecompSymmetricTensor(
        rank=3, dim=dim,
        weights=jax.random.normal(key, (4,)),
        factors=jax.random.normal(key, (4, dim)),
        multiplicities=(3,),
    )
    chis = [
        st.DecompSymmetricTensor.from_matrix(
            jnp.eye(dim) * (i + 1) * 0.1, cutoff=0.0
        )
        for i in range(dim)
    ]
    t0 = time.perf_counter()
    res = symalg.contract_tensor_list(Ad, chis, n_times=1)
    float(jnp.sum(res.data))
    out["c4_contract_tensor_list_64list_rank2_n1_first_call_s"] = round(
        time.perf_counter() - t0, 2
    )

    # config 5 (stretch): batched eval, 1024 inputs, rank-4 dim-100
    xs = jax.random.normal(key, (1024, d), jnp.float32)
    f_b = jax.jit(
        lambda xs: symalg.contract_all_indices_with_vector_batched(A4, xs)
    )
    t = dev_time(lambda: f_b(xs), K=3)
    out["c5_batched1024_r4_d100_ms"] = round(t * 1e3, 2)
    flops = 2.0 * n * 1024
    out["c5_packed_gemm_tflops"] = round(flops / t / 1e12, 2)

    # headline op bf16 variant: rank-6 dim-100
    r, d = 6, 100
    n = st.utils.indep_size(r, d)
    vals16 = jax.random.normal(key, (n,), jnp.bfloat16)
    A16 = st.FlatSymmetricTensor._raw(r, d, vals16)
    x = jax.random.normal(key, (d,), jnp.float32)
    t = dev_time(lambda: poly_eval_flat_fast(A16, x), K=5)
    out["headline_bf16_eval_r6_d100_ms"] = round(t * 1e3, 2)
    out["headline_bf16_effective_tflops"] = round(
        sum(2.0 * d**k for k in range(1, r + 1)) / t / 1e12, 1
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
