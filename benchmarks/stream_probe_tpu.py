"""Isolate which piece of the streaming tensordot kernel faults the TPU
worker at dim 100 (benchmarks/tensordot_stream_tpu.py crash).

Runs, one fence at a time:
  1. the int8 rep-table upload + reshape/slice pattern
  2. the in-kernel sort network on (r, n_k, B) int32
  3. position_jnp_T ranking at kernel shapes
  4. one full _combine_streamed body via lax.map over 2 blocks
  5. the full streaming tensordot at the given dim

Usage:  python benchmarks/stream_probe_tpu.py [dim]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import symtensor_tpu as st
    from symtensor_tpu import symalg
    from symtensor_tpu.utils.tables import tables

    d = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    print(f"dim={d} device={jax.devices()[0]}", flush=True)
    r, k = 3, 1
    r_out = 4

    t_out = tables(r_out, d)
    n_out = t_out.n
    B = 16384
    rep_np = t_out.rep_np().astype(np.int8)

    # 1. int8 flat upload + reshape + block slice
    rep_flat = jnp.asarray(rep_np.reshape(-1))
    blk = jax.jit(lambda v: v[: B * r_out].reshape(B, r_out).astype(jnp.int32).T)(
        rep_flat
    )
    print("1. int8 upload/reshape ok:", blk.shape, int(blk[0, 0]), flush=True)

    # 2. sort network on (r, n_k, B)
    rng = np.random.default_rng(0)
    big = jnp.asarray(rng.integers(0, d, (r, d, B)), jnp.int32)
    s = jax.jit(lambda v: jnp.sort(v, axis=0))(big)
    print("2. sort ok:", int(jnp.sum(s) % 97), flush=True)

    # 3. position ranking at kernel shapes
    t_a = tables(r, d)
    srt = jnp.sort(big, axis=0)
    pos = jax.jit(t_a.position_jnp_T)(srt.reshape(r, d * B))
    print("3. ranking ok:", int(jnp.max(pos)), "<", t_a.n, flush=True)

    # 4. one streamed body over 2 blocks
    from symtensor_tpu.ops.outer import _combine_streamed

    n = st.utils.indep_size(r, d)
    key = jax.random.PRNGKey(0)
    A = st.FlatSymmetricTensor._raw(r, d, jax.random.normal(key, (n,), jnp.float32))
    Bt = st.FlatSymmetricTensor._raw(
        r, d, jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
    )
    import os

    os.environ["SYMTENSOR_STREAM_BLOCK_ELEMS"] = str(2**22)
    out = jax.jit(lambda a, b: _combine_streamed(a, b, 1))(A, Bt)
    print("4. streamed body ok:", float(out[0]), flush=True)

    # 5. full op
    got = symalg.tensordot(A, Bt, axes=1, stream=True)
    print("5. full op ok:", float(got.data[0]), flush=True)


if __name__ == "__main__":
    main()
