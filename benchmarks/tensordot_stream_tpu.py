"""Streaming symmetrized tensordot at dim 100 on the real TPU.

Round 1 raised MemoryError past the table guard for this size
(n_sub*n_k*n_out ~ 5e9 table entries); the streaming blocked path
(ops/outer.py:_combine_streamed) ranks gather positions in-kernel from the
closed-form gflat addressing, so it runs in bounded memory at any size.
Reference semantics: /root/reference/symtensor/symalg.py:424-459.

Checks on-chip correctness at a small size (same code path, stream forced)
against the dense symmetrize oracle, then times rank-3 x rank-3 dim-100
axes=1 (output rank 4, n_out = C(103,4) = 4,421,275).

Usage:  python benchmarks/tensordot_stream_tpu.py
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

    def dev_time(fn, K=3):
        float(jnp.sum(fn()))  # compile + warm
        t0 = time.perf_counter()
        acc = None
        for _ in range(K):
            r = jnp.sum(fn())
            acc = r if acc is None else acc + r
        float(acc)
        return max((time.perf_counter() - t0 - FLOOR) / K, 1e-9)

    rng = np.random.default_rng(0)

    # --- correctness: small size, streaming path forced, dense oracle ---
    d_s = 6
    da = np.asarray(symmetrize(rng.normal(size=(d_s,) * 3)))
    db = np.asarray(symmetrize(rng.normal(size=(d_s,) * 3)))
    A_s = st.FlatSymmetricTensor.from_dense(jnp.asarray(da, jnp.float32))
    B_s = st.FlatSymmetricTensor.from_dense(jnp.asarray(db, jnp.float32))
    got = np.asarray(symalg.tensordot(A_s, B_s, axes=1, stream=True).todense())
    oracle = np.asarray(symmetrize(np.tensordot(da, db, axes=1)))
    out["stream_tensordot_relerr"] = float(
        np.max(np.abs(got - oracle)) / np.max(np.abs(oracle))
    )

    # --- the round-1 wall: rank-3 x rank-3, dim 100, axes=1 ---
    r = 3
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n = st.utils.indep_size(r, d)
    key = jax.random.PRNGKey(0)
    A = st.FlatSymmetricTensor._raw(r, d, jax.random.normal(key, (n,), jnp.float32))
    B = st.FlatSymmetricTensor._raw(
        r, d, jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
    )
    f = jax.jit(lambda a, b: symalg.tensordot(a, b, axes=1, stream=True).data)
    t0 = time.time()
    float(jnp.sum(f(A, B)))
    out["compile_s"] = round(time.time() - t0, 1)
    out[f"tensordot_r3r3_d{d}_ms"] = round(dev_time(lambda: f(A, B)) * 1e3, 1)
    out["n_out"] = st.utils.indep_size(4, d)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
