"""Probe: can round-3 kill the cold-compile tax?

Two independent questions, each answered with on-chip measurements:

1. Does the JAX persistent compilation cache (jax_compilation_cache_dir)
   work through the axon remote-compile path?  If yes, a repo-local cache
   dir survives TPU-worker crashes (the worker-side cache does not), so a
   "cold worker" flagship run pays compiles once per repo lifetime, not
   once per crash.

2. Do CONCURRENT compile requests make progress in parallel?  The relay
   exposes many ports (8082-8117); if .lower().compile() calls issued
   from several threads overlap, the ~9 root-pass programs of the rank-6
   flagship (2-4 min each, 573 s serial) can be pre-compiled in roughly
   the time of the slowest one.

Usage:
  python benchmarks/compile_cache_probe.py phase1   # populate cache, serial
  python benchmarks/compile_cache_probe.py phase2   # fresh process, re-time
  python benchmarks/compile_cache_probe.py parallel # threaded compiles
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CACHE_DIR = "/root/repo/.jax_cache_probe"


def make_programs(jax, jnp, n_prog, tag):
    """n_prog structurally-distinct mid-size programs (distinct unroll
    lengths -> distinct HLO -> distinct cache entries / compile requests)."""
    progs = []
    for p in range(n_prog):
        reps = 12 + p  # distinct op counts per program

        def body(a, b, _reps=reps, _p=p):
            x = a
            for i in range(_reps):
                x = jnp.tanh(x @ b) + jnp.float32(0.001 * (_p + i))
                x = x - jnp.mean(x, axis=1, keepdims=True)
            return jnp.sum(x)

        progs.append(jax.jit(body))
    return progs


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "phase1"
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    out = {"mode": mode, "device": str(jax.devices()[0])}
    a = jnp.ones((512, 512), jnp.float32)
    b = jnp.eye(512, dtype=jnp.float32) * 0.5
    float(jnp.sum(a[0, :4]))  # first contact

    if mode in ("phase1", "phase2"):
        progs = make_programs(jax, jnp, 3, mode)
        times = []
        for i, f in enumerate(progs):
            t0 = time.time()
            r = f(a, b)
            float(r)
            times.append(round(time.time() - t0, 2))
        out["compile_times_s"] = times
        out["cache_files"] = (
            len(list(pathlib.Path(CACHE_DIR).glob("*")))
            if pathlib.Path(CACHE_DIR).exists()
            else 0
        )
    elif mode == "parallel":
        import threading

        progs = make_programs(jax, jnp, 4, "par")
        # serial reference: 2 fresh programs
        t0 = time.time()
        for f in progs[:2]:
            float(f(a, b))
        out["serial_2_s"] = round(time.time() - t0, 2)
        # parallel: 2 more fresh programs on threads
        res = {}

        def run(i):
            t0 = time.time()
            float(progs[2 + i](a, b))
            res[i] = round(time.time() - t0, 2)

        ths = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        t0 = time.time()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        out["parallel_2_wall_s"] = round(time.time() - t0, 2)
        out["parallel_each_s"] = [res.get(i) for i in range(2)]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
