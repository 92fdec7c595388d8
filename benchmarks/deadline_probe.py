"""Test the program-runtime-deadline theory of the TPU worker "kernel
faults" through the axon tunnel.

OUTCOME (recorded): the deadline theory is REFUTED — a ~595 s single
fori_loop program completed without a worker crash, so long programs
are not killed on runtime.  Two oddities surfaced instead: (a) the
scaled-identity matmul loop returned v=1.0000 at several iteration
counts where float32 math gives ~5e-16 (CPU verified) — an unexplained
wrong result from the tunnel (random-matrix loops in
deadline_probe2.py are self-consistent, so production ops with oracle
checks are unaffected); (b) a 156x superlinear time jump between 176k
and 352k iterations.  The basis-change fault bisection continued in
basis_t0_probe.py; the correlate left standing there is the lax.map
xs table size / step count (crashes at ≥20,000 steps / ≥155 MB int8
table; passes at ≤7,424 steps / ≤57 MB).

This probe times a pure dependent-matmul fori_loop (tiny memory, no
gathers) at increasing iteration counts: calibrate per-iteration cost,
then run targets of ~30 s, ~75 s, ~150 s, ~300 s.

Usage:  python benchmarks/deadline_probe.py [targets_seconds...]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    targets = [float(a) for a in sys.argv[1:]] or [30.0, 75.0, 150.0, 300.0]
    print(f"device={jax.devices()[0]} targets={targets}", flush=True)

    n = 1024
    x0 = jnp.eye(n, dtype=jnp.float32) * 0.999

    def run(iters):
        @jax.jit
        def prog(x):
            def body(_, x):
                return (x @ x0) * 1.0000001
            return jax.lax.fori_loop(0, iters, body, x)

        t0 = time.time()
        out = prog(x0)
        v = float(out[0, 0])
        return time.time() - t0, v

    # calibrate by SLOPE between two counts — a single run is dominated
    # by the fixed tunnel dispatch/readback cost (~1.7 s), which made
    # the first version undershoot runtimes by ~75x
    run(2000)
    d1, _ = run(50_000)
    d2, _ = run(400_000)
    per_iter = (d2 - d1) / 350_000
    print(f"calibration: {per_iter*1e6:.2f} us/iter by slope "
          f"({d1:.2f}s @50k, {d2:.2f}s @400k)", flush=True)

    for tgt in targets:
        iters = max(100, int(tgt / per_iter))
        print(f"target {tgt:.0f}s -> {iters} iters: dispatch...", flush=True)
        try:
            dt, v = run(iters)
            print(f"  OK in {dt:.1f}s (v={v:.4f})", flush=True)
        except Exception as e:  # noqa: BLE001 — record and stop
            print(f"  CRASH after dispatch: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            break


if __name__ == "__main__":
    main()
