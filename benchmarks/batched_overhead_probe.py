"""Where do the ~0.35 ms go between the C5 batched kernel (0.60 ms) and
the public op (~0.95 ms)?  (VERDICT r4 item 4.)

Same-process, multi-round medians (first-round readings through the
tunnel are ~27 ms regardless of program — CLAUDE.md).  Legs:

  a) raw jitted views kernel, device-resident xs     (the 0.60 ms figure)
  b) public op, device-resident xs                   (the ~0.95 ms figure)
  c) public op under caller jit (run_configs C5 form)
  d) public op, FRESH numpy xs each call             (upload included)

If (b) ≈ (a) and (d) − (b) ≈ 0.35 ms, the round-4 gap was the per-call
host→device xs upload (1024×100 f32 = 400 KB at ~48-78 MB/s ≈ 5-8 ms
worst case, ~4 ms small-upload floor), not routing overhead.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import symtensor_tpu as st
from symtensor_tpu import symalg
from symtensor_tpu.kernels import poly_eval as PE
from symtensor_tpu.utils import combinatorics as comb


def floor_time():
    tiny = jax.jit(lambda v: v + 1.0)
    float(tiny(jnp.zeros(())))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(tiny(jnp.zeros(())))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def dev_time(fn, floor, K=8, rounds=4):
    float(jnp.sum(fn()))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        acc = None
        for _ in range(K):
            r = jnp.sum(fn())
            acc = r if acc is None else acc + r
        float(acc)
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)[1:]  # drop the first-round artifact
    return (float(np.median(ts)) - floor) / K


def main():
    print("device:", jax.devices()[0], flush=True)
    floor = floor_time()
    print(f"floor {floor*1e3:.1f} ms", flush=True)
    r, d, B = 4, 100, 1024
    n = comb.indep_size(r, d)
    key = jax.random.PRNGKey(0)
    A = st.FlatSymmetricTensor._raw(
        r, d, jax.random.normal(key, (n,), jnp.float32))
    xs_dev = jax.random.normal(key, (B, d), jnp.float32)
    float(jnp.sum(xs_dev))
    xs_np = np.asarray(xs_dev)

    views = PE.group_views(A)
    kern = PE._views_eval_batched_jitted(r, d)
    t_a = dev_time(lambda: kern(views, xs_dev), floor)
    print(f"a) raw kernel, device xs:      {t_a*1e3:7.3f} ms", flush=True)

    pub = symalg.contract_all_indices_with_vector_batched
    t_b = dev_time(lambda: pub(A, xs_dev), floor)
    print(f"b) public op, device xs:       {t_b*1e3:7.3f} ms", flush=True)

    f_jit = jax.jit(lambda xs: pub(A, xs))
    t_c = dev_time(lambda: f_jit(xs_dev), floor)
    print(f"c) public op under caller jit: {t_c*1e3:7.3f} ms", flush=True)

    t_d = dev_time(lambda: pub(A, xs_np), floor)
    print(f"d) public op, numpy xs/call:   {t_d*1e3:7.3f} ms", flush=True)

    print(
        f"\nrouting overhead (b-a): {(t_b-t_a)*1e3:.3f} ms; "
        f"caller-jit delta (c-b): {(t_c-t_b)*1e3:.3f} ms; "
        f"upload cost (d-b): {(t_d-t_b)*1e3:.3f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
