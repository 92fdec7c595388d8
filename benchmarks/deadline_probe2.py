"""Characterize tunnel mis-execution / time cliffs on long fori_loops.

deadline_probe.py found BOTH of:
  - wrong results: a 1024x1024 dependent-matmul fori_loop returned
    v=1.0000 at 35k-352k iters where the true value is ~5e-16 (CPU
    verified) — the remote worker returned an unrelated/stale buffer;
  - a time cliff: 176k iters "ran" in 3.8 s (wrong result), 352k took
    595 s (also wrong result).

This probe pins down where faithful execution stops: random operand,
checksum compared against CPU (small counts) and against consistency
splits (big counts: one program of 2N iters vs two chained programs of
N), with timings.  Matmul operand is normalized so values stay O(1).

Usage:  python benchmarks/deadline_probe2.py [iters...]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = 512
    rng = np.random.default_rng(0)
    m = rng.normal(size=(n, n)).astype(np.float32)
    # normalize spectral radius to ~1 so powers neither vanish nor blow up
    ev = np.max(np.abs(np.linalg.eigvals(m)))
    m = m / float(ev)
    x_np = rng.normal(size=(n, n)).astype(np.float32)

    counts = [int(a) for a in sys.argv[1:]] or [8, 512, 4096, 32768, 131072]
    print(f"device={jax.devices()[0]} counts={counts}", flush=True)

    def make(iters, dev_m, dev_x):
        @jax.jit
        def prog(x):
            def body(_, x):
                y = x @ dev_m
                # renormalize each iter so magnitudes stay O(1)
                return y / jnp.sqrt(jnp.mean(y * y) + 1e-30)
            return jax.lax.fori_loop(0, iters, body, x)
        return prog

    # CPU oracle via numpy (float32, same op order)
    def cpu_run(iters):
        x = x_np.copy()
        for _ in range(iters):
            y = x @ m
            x = y / np.sqrt(np.mean(y * y) + 1e-30)
        return float(x[0, 0]), float(np.mean(np.abs(x)))

    dev_m = jnp.asarray(m)
    dev_x = jnp.asarray(x_np)
    for iters in counts:
        prog = make(iters, dev_m, dev_x)
        t0 = time.time()
        out = prog(dev_x)
        v = float(out[0, 0])
        mean = float(jnp.mean(jnp.abs(out)))
        dt = time.time() - t0
        if iters <= 4096:
            cv, cmean = cpu_run(iters)
            ok = abs(v - cv) < 2e-2 and abs(mean - cmean) < 2e-2
            print(f"iters={iters}: {dt:.1f}s v={v:.5f} (cpu {cv:.5f}) "
                  f"mean={mean:.5f} (cpu {cmean:.5f}) "
                  f"{'MATCH' if ok else 'MISMATCH'}", flush=True)
        else:
            # consistency split: N iters then N more must equal 2N
            half = make(iters // 2, dev_m, dev_x)
            o2 = half(half(dev_x))
            v2 = float(o2[0, 0])
            m2 = float(jnp.mean(jnp.abs(o2)))
            ok = abs(v - v2) < 2e-2 and abs(mean - m2) < 2e-2
            print(f"iters={iters}: {dt:.1f}s v={v:.5f} mean={mean:.5f} "
                  f"split v={v2:.5f} mean={m2:.5f} "
                  f"{'CONSISTENT' if ok else 'INCONSISTENT'}", flush=True)


if __name__ == "__main__":
    main()
