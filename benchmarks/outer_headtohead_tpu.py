"""C1-size outer head-to-head on the real TPU: one-hot-MXU gathers vs
XLA scalar-gather fallback vs the streaming blocked path.

Settles the routing for `symalg.multiply.outer` at table sizes that fit
the gather_mm cap (reference semantics: symalg.py:294-316).  Run:
    python benchmarks/outer_headtohead_tpu.py [dim]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import symtensor_tpu as st
from symtensor_tpu.ops import outer as outer_mod
from symtensor_tpu.ops.symmetrize import symmetrize


def dev_time(fn, k=8):
    """K dependent dispatches + one scalar readback minus the floor."""
    fn()  # compile/warm
    t0 = time.time()
    for _ in range(k):
        out = fn()
    float(jnp.asarray(out).reshape(-1)[0])
    t1 = time.time()
    t0f = time.time()
    float(jnp.asarray(out).reshape(-1)[0])
    floor = time.time() - t0f
    return (t1 - t0 - floor) / k, floor


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rng = np.random.default_rng(0)
    dense = np.asarray(symmetrize(rng.normal(size=(dim,) * 3)))
    A = st.FlatSymmetricTensor.from_dense(jnp.asarray(dense, jnp.float32))
    B = st.FlatSymmetricTensor.from_dense(
        jnp.asarray(np.asarray(symmetrize(rng.normal(size=(dim,) * 3))),
                    jnp.float32)
    )
    out = {"dim": dim}

    # NOTE: the op is measured EAGERLY (its internals jit themselves).
    # Wrapping the whole op in jax.jit bakes the (n_sub, n_out) subset
    # tables into the program as constants — 260 MB of MLIR at dim 30,
    # which the remote compile helper kills (and which the library now
    # routes to the streamed path instead).

    # 1. production routing (gather_mm when usable)
    f_prod = lambda a, b: outer_mod.symmetric_outer(a, b, stream=False).data
    t, floor = dev_time(lambda: f_prod(A, B))
    out["floor_ms"] = round(floor * 1e3, 1)
    out["mxu_gather_ms"] = round(t * 1e3, 1)

    # 2. XLA scalar-gather fallback (bypass the Pallas kernel)
    import symtensor_tpu.kernels.gather_mm as gm
    saved = gm._MAX_SRC
    gm._MAX_SRC = 0
    f_xla = lambda a, b: outer_mod.symmetric_outer(a, b, stream=False).data
    t, _ = dev_time(lambda: f_xla(A, B))
    out["xla_gather_ms"] = round(t * 1e3, 1)
    vb = np.asarray(f_xla(A, B), np.float64)  # while the cap is still 0
    gm._MAX_SRC = saved

    # 3. streaming blocked path (also what a caller's jit now traces)
    f_str = lambda a, b: outer_mod.symmetric_outer(a, b, stream=True).data
    t, _ = dev_time(lambda: f_str(A, B))
    out["stream_ms"] = round(t * 1e3, 1)

    # 4. traced whole-op (user jit) — should route to stream now
    f_jit = jax.jit(lambda a, b: outer_mod.symmetric_outer(a, b).data)
    t, _ = dev_time(lambda: f_jit(A, B))
    out["traced_op_ms"] = round(t * 1e3, 1)

    # agreement
    va = np.asarray(f_prod(A, B), np.float64)
    vc = np.asarray(f_str(A, B), np.float64)
    out["mxu_vs_xla_relerr"] = float(
        np.max(np.abs(va - vb)) / np.max(np.abs(vb))
    )
    out["stream_vs_xla_relerr"] = float(
        np.max(np.abs(vc - vb)) / np.max(np.abs(vb))
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
