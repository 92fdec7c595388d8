"""On-chip validation drives (real TPU; run one process at a time).

Consolidates the round-1 manual verification scripts: kernel correctness on
hardware (Mosaic lowering differs from interpret mode — bf16 MXU rounding
and lane-relayout bugs only show up here), plus device timings with the
readback-floor methodology (see bench.py).

Usage:  python benchmarks/tpu_checks.py            # ~5-15 min (compiles)
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
    from symtensor_tpu import symalg
    from symtensor_tpu.kernels.gather_mm import gather_combine
    from symtensor_tpu.kernels.pallas_poly import poly_eval_flat_pallas
    from symtensor_tpu.kernels.poly_eval import poly_eval_flat_fast
    from symtensor_tpu.ops.symmetrize import symmetrize

    assert jax.devices()[0].platform == "tpu", "needs the real TPU"
    out = {}

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

    def dev_time(fn, K=5):
        float(jnp.sum(fn()))
        t0 = time.perf_counter()
        acc = None
        for _ in range(K):
            r = jnp.sum(fn())
            acc = r if acc is None else acc + r
        float(acc)
        return max((time.perf_counter() - t0 - FLOOR) / K, 1e-9)

    rng = np.random.default_rng(0)

    # 1. gather_mm correctness on hardware (incl. the lifted 32K source cap)
    ok = True
    for (n_a, n_b, S, n_out) in [
        (21, 21, 6, 126),
        (300, 300, 20, 5000),
        (20000, 30000, 6, 8000),
    ]:
        a = jnp.asarray(rng.normal(size=n_a), jnp.float32)
        b = jnp.asarray(rng.normal(size=n_b), jnp.float32)
        ia = jnp.asarray(rng.integers(0, n_a, (S, n_out)), jnp.int32)
        ib = jnp.asarray(rng.integers(0, n_b, (S, n_out)), jnp.int32)
        got = np.asarray(gather_combine(a, b, ia, ib, interpret=False))
        ref = np.asarray((a[ia] * b[ib]).mean(0))
        ok &= bool(
            np.allclose(got, ref, rtol=1e-4, atol=1e-5)
        )
    out["gather_mm_correct"] = ok

    # 2. pallas grouped-eval kernel correctness (small scale; full-scale
    #    compiles ~100 kernels through the remote helper — too slow here)
    rank, dim = 6, 8
    n = st.utils.indep_size(rank, dim)
    A = st.FlatSymmetricTensor._raw(
        rank, dim, jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (dim,), jnp.float32)
    a1 = float(poly_eval_flat_pallas(A, x, interpret=False))
    a2 = float(poly_eval_flat_fast(A, x))
    out["pallas_poly_relerr"] = abs(a1 - a2) / max(abs(a2), 1e-30)

    # 3. on-chip symalg vs oracle
    dense = np.asarray(symmetrize(rng.normal(size=(6,) * 3)))
    A3 = st.FlatSymmetricTensor.from_dense(jnp.asarray(dense, jnp.float32))
    got = np.asarray(symalg.multiply.outer(A3, A3).todense())
    oracle = np.asarray(symmetrize(np.multiply.outer(dense, dense)))
    out["outer_on_chip_correct"] = bool(np.allclose(got, oracle, atol=1e-4))

    # 4. timings at BASELINE C1 size
    r, d = 3, 30
    n = st.utils.indep_size(r, d)
    key = jax.random.PRNGKey(0)
    Af = st.FlatSymmetricTensor._raw(r, d, jax.random.normal(key, (n,), jnp.float32))
    Bf = st.FlatSymmetricTensor._raw(r, d, jax.random.normal(key, (n,), jnp.float32))
    # eager: jitting the whole op would bake the subset tables into the
    # program as constants (130 MB each at this size) — and would measure
    # the streamed route the library now picks under tracing, not the
    # production eager kernels
    f_outer = lambda a, b: symalg.multiply.outer(a, b).data
    out["outer_r3r3_d30_ms"] = round(dev_time(lambda: f_outer(Af, Bf)) * 1e3, 1)
    f_td = lambda a, b: symalg.tensordot(a, b, axes=1).data
    out["tensordot_ax1_ms"] = round(dev_time(lambda: f_td(Af, Bf)) * 1e3, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
