"""Round-4 VERDICT item 5: re-decide the Pallas single-input eval default
now that the persistent compile cache (on by default since round 3) makes
the ~10-minute ~100-group compile a once-per-machine cost.

Measures, same process, on the flagship shape (rank-6 dim-100 f32):
  a) wall time of the FIRST pallas call in this process (disk-cached
     compiles → should be seconds, not minutes, on a warmed machine);
  b) warm device time of the pallas path;
  c) warm device time of the jnp-views path (production default);
  d) numerical agreement between them.

Decision rule (docs/benchmarks.md "Pallas vs jnp-views"): promote pallas
iff its warm time beats the views path (both are HBM-bandwidth-bound, so
any win is fusion of the head recursion) AND the cold-process cached
start-up is acceptable (< ~60 s).

Usage: python benchmarks/pallas_redecision_tpu.py [rank dim]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import symtensor_tpu as st
from symtensor_tpu.config import config
from symtensor_tpu.kernels import pallas_poly, poly_eval
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


def device_time(fn, floor, repeats=8):
    fence(jnp.sum(fn()))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(repeats):
            r = jnp.sum(fn())
            acc = r if acc is None else acc + r
        fence(acc)
        ts.append(time.perf_counter() - t0)
    return max((float(np.median(ts)) - floor) / repeats, 1e-9)


def main():
    rank = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    config.max_table_entries = 3_000_000_000
    n = comb.indep_size(rank, dim)
    print(f"rank={rank} dim={dim} n={n:,} device={jax.devices()[0]}",
          flush=True)
    key = jax.random.PRNGKey(0)
    A = st.FlatSymmetricTensor._raw(
        rank, dim, jax.random.normal(key, (n,), jnp.float32) / n**0.5
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (dim,), jnp.float32)
    floor = measure_floor()
    print(f"readback floor = {floor*1e3:.1f} ms", flush=True)

    # views path first (its programs are warm from other runs usually)
    t0 = time.perf_counter()
    v_views = poly_eval.poly_eval_flat(A, x)
    fence(v_views)
    print(f"views first call: {time.perf_counter()-t0:.1f} s", flush=True)
    t_views = device_time(lambda: poly_eval.poly_eval_flat(A, x), floor)

    t0 = time.perf_counter()
    v_pal = pallas_poly.poly_eval_flat_pallas(A, x)
    fence(v_pal)
    t_pal_first = time.perf_counter() - t0
    print(f"pallas first call (cold process, disk cache): "
          f"{t_pal_first:.1f} s", flush=True)
    t_pal = device_time(
        lambda: pallas_poly.poly_eval_flat_pallas(A, x), floor
    )

    rel = abs(float(v_pal) - float(v_views)) / (abs(float(v_views)) + 1e-30)
    print(f"views  warm: {t_views*1e3:8.2f} ms")
    print(f"pallas warm: {t_pal*1e3:8.2f} ms   first: {t_pal_first:.1f} s "
          f"  rel vs views: {rel:.2e}")
    verdict = (
        "PROMOTE pallas" if t_pal < 0.95 * t_views and t_pal_first < 60
        else "KEEP views"
    )
    print(f"decision: {verdict}", flush=True)


if __name__ == "__main__":
    main()
