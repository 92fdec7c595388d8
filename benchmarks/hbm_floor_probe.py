"""HBM streaming floor vs the flagship poly-eval, same process, real TPU.

The headline bench (rank-6 dim-100 vector contraction, 11.5 ms on a
3.2 GB bf16 read) implies ~280 GB/s effective bandwidth against the v5e
peak of ~819 GB/s. This probe measures, on the SAME buffer:

  a) jnp.sum(buf)            — the pure streaming-reduction floor
  b) jnp.dot(buf, w)         — one flat GEMV (same bytes, one weight read)
  c) poly_eval_flat_fast     — the production grouped evaluation

If (a)/(b) land near 4 ms, the grouped kernel has ~2.5x headroom and a
streaming Pallas/laid-out variant is the next headline lever; if they land
near 11 ms, the current kernel is already at the machine floor and the
bench number is speed-of-light.

Timing: dependent dispatches + one scalar readback minus the measured
floor (block_until_ready does not fence through the axon tunnel).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import symtensor_tpu as st
from symtensor_tpu.kernels.poly_eval import poly_eval_flat_fast
from symtensor_tpu.utils import combinatorics as comb


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def measure_floor():
    x = jnp.zeros((1,), jnp.float32)
    fence(x)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        fence(x)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def device_time(fn, floor, repeats=6):
    float(jnp.sum(fn()))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(repeats):
            r = jnp.sum(fn())
            acc = r if acc is None else acc + r
        float(acc)
        ts.append(time.perf_counter() - t0)
    return max((float(np.median(ts)) - floor) / repeats, 1e-9)


def main():
    rank = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    dt = jnp.bfloat16 if len(sys.argv) <= 3 else jnp.dtype(sys.argv[3])
    n = comb.indep_size(rank, dim)
    gb = n * jnp.dtype(dt).itemsize / 1e9
    print(f"rank={rank} dim={dim} n={n:,} ({gb:.2f} GB {jnp.dtype(dt).name})"
          f" device={jax.devices()[0]}", flush=True)
    floor = measure_floor()
    print(f"readback floor = {floor*1e3:.1f} ms", flush=True)

    # fill in chunks (one-shot normal(n) spikes 3x n)
    nchunk = 16
    csz = -(-n // nchunk)
    from functools import partial

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def fill(buf, key, lo, m):
        chunk = jax.random.normal(key, (m,), dt)
        return jax.lax.dynamic_update_slice(buf, chunk, (lo,))

    buf = jnp.zeros((n,), dt)
    for i in range(nchunk):
        lo = i * csz
        m = min(csz, n - lo)
        if m > 0:
            buf = fill(buf, jax.random.PRNGKey(i), lo, m)
    fence(buf[:1])

    sum_j = jax.jit(lambda b: jnp.sum(b.astype(jnp.float32)))
    t = device_time(lambda: sum_j(buf), floor)
    print(f"sum floor: {t*1e3:8.2f} ms  -> {gb/t:6.1f} GB/s", flush=True)

    w = jax.random.normal(jax.random.PRNGKey(99), (n,), dt)
    fence(w[:1])
    dot_j = jax.jit(lambda b, ww: jax.lax.dot_general(
        b[None, :], ww[None, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(()))
    t = device_time(lambda: dot_j(buf, w), floor)
    print(f"flat GEMV: {t*1e3:8.2f} ms  -> {2*gb/t:6.1f} GB/s (both reads)",
          flush=True)
    del w

    A = st.FlatSymmetricTensor._raw(rank, dim, buf)
    x = jax.random.normal(jax.random.PRNGKey(1), (dim,), jnp.float32)
    t = device_time(lambda: poly_eval_flat_fast(A, x), floor)
    print(f"poly_eval: {t*1e3:8.2f} ms  -> {gb/t:6.1f} GB/s effective",
          flush=True)


if __name__ == "__main__":
    main()
