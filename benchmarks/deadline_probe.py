"""Test the program-runtime-deadline theory of the TPU worker "kernel
faults" through the axon tunnel.

Evidence so far (basis_t0_probe*.py): the rank-6 t=0 step kernel passes
at 7,424 map steps (45 s measured) and crashes at 59,408 steps (~6 min
projected) EVEN with the big stacked output removed — i.e. the fault
tracks total program RUNTIME, not buffer sizes or trip counts.  The
historical faults fit too: streamed tensordot crashed only when
per-step blocks (hence total runtime) grew, and every successful long
program clocked ≤ ~57 s.

This probe times a pure dependent-matmul fori_loop (tiny memory, no
gathers) at increasing iteration counts: calibrate per-iteration cost,
then run targets of ~30 s, ~75 s, ~150 s, ~300 s.  If programs above a
threshold crash with the same UNAVAILABLE error, the deadline theory is
confirmed and the fix everywhere is host-level chunking of long
programs (+ fences), NOT shape surgery.

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
