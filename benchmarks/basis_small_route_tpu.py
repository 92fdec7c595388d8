"""TPU timing of the size-gated whole-op jitted basis-change route.

Measures contract_all_indices_with_matrix at sizes inside the small gate
(default rank-4 dim-100; override via argv `rank dim [dim_out]`), against
the recorded round-1 number for the same program shape (209 ms) and the
blocked recursion's warm time (1.9 s eager at rank-4 dim-100).

Timing: K dependent calls + one scalar readback, minus the measured
roundtrip floor (block_until_ready does not fence through the tunnel).

To probe sizes beyond the default gate (e.g. rank-5 dim-100 whole-op),
raise SYMTENSOR_BASIS_SMALL_ELEMS — do an AOT memory check first:
    python benchmarks/basis_small_route_tpu.py 5 100 --aot
compiles chiplessly and prints memory_analysis() without touching the chip.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import symtensor_tpu as st
from symtensor_tpu.ops.basis_change import (
    _basis_change_small,
    _small_peak_elems,
)
from symtensor_tpu.utils import combinatorics as comb


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    aot = "--aot" in sys.argv
    rank = int(args[0]) if args else 4
    dim = int(args[1]) if len(args) > 1 else 100
    dim_out = int(args[2]) if len(args) > 2 else dim
    n = comb.indep_size(rank, dim)
    peak = _small_peak_elems(rank, dim, dim_out, 2**26)
    print(
        f"rank={rank} dim={dim}->{dim_out}: n={n:,}, projected peak "
        f"{peak:,} elems ({4 * peak / 1e9:.2f} GB f32 + transient)",
        flush=True,
    )

    f32 = jnp.float32
    fn = _basis_change_small(rank, dim, dim_out, f32, f32, 2**26)

    if aot:
        shapes = (
            jax.ShapeDtypeStruct((n,), f32),
            jax.ShapeDtypeStruct((dim, dim_out), f32),
        )
        t0 = time.time()
        compiled = fn.lower(*shapes).compile()
        print(f"AOT compiled in {time.time() - t0:.1f}s")
        print(compiled.memory_analysis())
        return

    print(f"device = {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (n,), f32)
    W = jax.random.normal(jax.random.PRNGKey(1), (dim, dim_out), f32)

    # roundtrip floor
    tiny = jax.jit(lambda v: v + 1.0)
    float(tiny(jnp.zeros(())))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(tiny(jnp.zeros(())))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))

    t0 = time.time()
    out = fn(A, W)
    s0 = float(out[0])
    print(f"cold (compile+run): {time.time() - t0:.1f}s", flush=True)

    # identity check: C · x^{⊗r} == A · (Wx)^{⊗r}
    x = jax.random.normal(jax.random.PRNGKey(2), (dim_out,), f32)
    lhs = st.symalg.contract_all_indices_with_vector(
        st.FlatSymmetricTensor._raw(rank, dim_out, out), x
    )
    rhs = st.symalg.contract_all_indices_with_vector(
        st.FlatSymmetricTensor._raw(rank, dim, A), W @ x
    )
    lv, rv = float(lhs), float(rhs)
    rel = abs(lv - rv) / max(1e-30, abs(rv))
    print(f"identity check: {lv:.6e} vs {rv:.6e} (rel {rel:.2e})")

    K = 5
    t0 = time.perf_counter()
    if dim_out == dim:
        # dependent chain (square W keeps shapes): forces serialization
        cur = A
        for _ in range(K):
            cur = fn(cur, W)
        out = cur
    else:
        # independent dispatches serialize on the one device anyway
        for _ in range(K):
            out = fn(A, W)
    _ = float(out[0])
    dt = (time.perf_counter() - t0 - floor) / K
    print(f"warm: {dt * 1e3:.1f} ms/call  (floor {floor * 1e3:.1f} ms, K={K})")


if __name__ == "__main__":
    main()
