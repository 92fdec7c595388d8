"""Compare TPU gather forms at exact L1→2 rank-5 flagship shapes.

The retired output-major basis change ran rank-4 dim-100 in 209 ms using
`U[:, tbl]` (a 2-D axis-1 shared-index gather); the current step kernel
uses flat-buffer `lax.gather` row slices and takes ~47 s on the same
index count at rank 5. This measures the forms head to head:

  a) flat 1-D buffer, slice_sizes=(npar,) row gathers  (current kernel)
  b) 2-D (npar, width) block, U[:, idx] axis-1 gather  (old kernel)
  c) flat 1-D element gather (npar separate planes)

Usage:  python benchmarks/gather_form_probe.py [npar width n_idx]
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

    npar = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 4_421_275
    n_idx = int(sys.argv[3]) if len(sys.argv) > 3 else 17_685_100
    out = {"npar": npar, "width": width, "n_idx": n_idx,
           "device": str(jax.devices()[0])}

    def fence(x):
        return float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))

    _z = jnp.zeros(())
    fence(_z)
    t0 = time.time()
    fence(_z)
    FLOOR = time.time() - t0

    def timeit(fn, k=2):
        fn()
        r = fn()
        fence(r)
        t0 = time.time()
        for _ in range(k):
            r = fn()
        fence(r)
        return max((time.time() - t0 - FLOOR) / k, 0.0)

    rng = np.random.default_rng(0)
    flat = jax.random.normal(
        jax.random.PRNGKey(0), (npar * width,), jnp.float32
    )
    U2 = flat.reshape(npar, width)
    # chunk the index stream so transients stay bounded (~2e5 per step)
    CH = 200_000
    nch = n_idx // CH
    idx = jnp.asarray(
        rng.integers(0, width, (nch, CH), np.int64).astype(np.int32)
    )

    # a) current: slice_sizes=(npar,) row gathers off the flat buffer
    def form_a():
        def body(ix):
            starts = (ix * npar)[:, None]
            G = jax.lax.gather(
                flat,
                starts,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(0,),
                    collapsed_slice_dims=(),
                    start_index_map=(0,),
                ),
                slice_sizes=(npar,),
            )
            return jnp.sum(G, axis=(0, 1))

        return jnp.sum(jax.lax.map(body, idx))

    fa = jax.jit(form_a)
    out["a_slice_rows_s"] = round(timeit(lambda: fa()), 3)
    print(json.dumps({"a": out["a_slice_rows_s"]}), flush=True)

    # b) old: 2-D axis-1 shared-index gather
    def form_b():
        def body(ix):
            G = U2[:, ix]  # (npar, CH)
            return jnp.sum(G, axis=(0, 1))

        return jnp.sum(jax.lax.map(body, idx))

    fb = jax.jit(form_b)
    out["b_axis1_2d_s"] = round(timeit(lambda: fb()), 3)
    print(json.dumps({"b": out["b_axis1_2d_s"]}), flush=True)

    # c) flat element gathers, one plane per parent row
    def form_c():
        def body(ix):
            acc = jnp.zeros((), jnp.float32)
            for p in range(min(npar, 4)):  # 4 planes, scaled in report
                acc = acc + jnp.sum(flat[ix * npar + p])
            return acc

        return jnp.sum(jax.lax.map(body, idx))

    fc = jax.jit(form_c)
    t_c4 = timeit(lambda: fc())
    out["c_element_4planes_s"] = round(t_c4, 3)
    out["c_element_scaled_s"] = round(t_c4 * npar / min(npar, 4), 3)

    for k, v in list(out.items()):
        if k.endswith("_s") and isinstance(v, float) and v > 0:
            out[k.replace("_s", "_Gel_per_s")] = round(
                n_idx * npar / v / 1e9, 2
            )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
