"""Isolate the rank-6 dim-100 basis-change level-0 TPU worker crash.

The rank-5 flagship works; rank-6 crashed on its first level-0 chunk. The
two structural differences at rank 6: (a) the root is split into TWO
~1.6 GB bf16 pieces (masked two-piece gather path, never before exercised
on hardware), and (b) the k=5 on-the-fly table is 460 MB int8 reshaped to
~67k lanes. This probes each in isolation at exact flagship shapes but a
bounded number of lax.map steps, one fence per stage.

Usage:  python benchmarks/basis_probe_tpu.py [steps]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    print(f"device={jax.devices()[0]} steps={steps}", flush=True)

    d, k = 100, 5
    seg = 13400
    L = 804_672_050  # one flagship root piece (bf16 elements)

    key = jax.random.PRNGKey(0)
    gen = jax.jit(lambda k_: jax.random.normal(k_, (L,), jnp.bfloat16))
    p1 = gen(key)
    p2 = gen(jax.random.PRNGKey(1))
    float(jnp.sum(p1[:8]).astype(jnp.float32))
    print("pieces materialized", flush=True)

    # 1. masked two-piece gather at flagship shapes, `steps` map steps
    # flagship positions are < n = 1.609e9 < 2^31, int32 like the kernel
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, 1_609_344_100, (steps, seg * d), np.int64).astype(
            np.int32
        )
    )

    def body(sl, pieces):
        acc = jnp.zeros(sl.shape, jnp.float32)
        off = 0
        for piece in pieces:
            Lp = piece.shape[0]
            loc = sl - off
            m = (loc >= 0) & (loc < Lp)
            acc = acc + jnp.where(
                m,
                piece[jnp.clip(loc, 0, Lp - 1)].astype(jnp.float32),
                jnp.zeros((), jnp.float32),
            )
            off += Lp
        return jnp.sum(acc.reshape(seg, d), axis=0)

    # pieces passed as args: a closure would bake 3.2 GB into the jaxpr
    out = jax.jit(
        lambda ix, ps: jnp.sum(jax.lax.map(lambda s_: body(s_, ps), ix))
    )(idx, (p1, p2))
    print("1. masked 2-piece gather ok:", float(out), flush=True)

    # 2. full-width int8 table reshape + per-step slicing
    n_k = 91_962_520
    nseg = -(-n_k // seg)
    tbl = jnp.asarray(
        rng.integers(0, d, (steps * seg * k,), np.int64).astype(np.int8)
    )

    def body2(tseg):
        rep = tseg.reshape(seg, k).astype(jnp.int32)
        return jnp.sum(rep, axis=1)[:8]

    out2 = jax.jit(
        lambda t: jnp.sum(jax.lax.map(body2, t.reshape(steps, seg * k)))
    )(tbl)
    print("2. int8 wide reshape/slice ok:", int(out2), flush=True)

    # 3. combined: gather + rank + einsum at level-0 shapes, few steps
    from symtensor_tpu.utils.tables import tables

    t6 = tables(6, d)
    rep5 = tables(5, d).rep_np()[: steps * seg].astype(np.int8).reshape(-1)
    tbl3 = jnp.asarray(rep5)
    W = jax.random.normal(jax.random.PRNGKey(2), (d, 4), jnp.float32)

    def body3(tseg, pieces):
        rep_T = tseg.reshape(seg, k).astype(jnp.int32).T
        full_T = jnp.concatenate(
            [
                jnp.broadcast_to(rep_T[:, :, None], (k, seg, d)),
                jnp.broadcast_to(
                    jnp.arange(d, dtype=jnp.int32)[None, None, :],
                    (1, seg, d),
                ),
            ],
            axis=0,
        )
        full_T = jnp.sort(full_T, axis=0)
        sl = t6.position_jnp_T(full_T)  # (seg, d)
        acc = jnp.zeros(sl.shape, jnp.float32)
        off = 0
        for piece in pieces:
            Lp = piece.shape[0]
            loc = sl - off
            m = (loc >= 0) & (loc < Lp)
            acc = acc + jnp.where(
                m,
                piece[jnp.clip(loc, 0, Lp - 1)].astype(jnp.float32),
                jnp.zeros((), jnp.float32),
            )
            off += Lp
        H = jax.lax.dot_general(
            acc[:, :, None],
            W,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return H[:, 0, :]

    out3 = jax.jit(
        lambda t, ps: jnp.sum(
            jax.lax.map(
                lambda s_: body3(s_, ps), t.reshape(steps, seg * k)
            )
        )
    )(tbl3, (p1, p2))
    print("3. full level-0 step ok:", float(out3), flush=True)


if __name__ == "__main__":
    main()
