"""Global configuration for symtensor-tpu.

The reference library has no config system (behavior is selected by class
choice — SURVEY.md §5); we keep that philosophy but expose a few knobs that
matter on TPU: default dtype, and size guards for the static gather tables
that back the generic compressed-domain ops.
"""

from __future__ import annotations

import dataclasses
import logging

logger = logging.getLogger("symtensor_tpu")


@dataclasses.dataclass
class Config:
    # Default dtype for newly-created tensors. float32 is the TPU-native
    # choice; tests that need 1e-12 agreement enable jax x64 and pass
    # float64 explicitly.
    default_dtype: str = "float32"

    # Maximum number of entries allowed in a host-built static table
    # (index tables, split tables for outer/tensordot, basis-change gathers).
    # Ops that would exceed this raise with a pointer to the streaming path.
    max_table_entries: int = 200_000_000

    # Maximum dense size (d**r) that todense()/dense fallbacks will
    # materialize before raising.
    max_dense_elements: int = 100_000_000

    # Emit a warning whenever an op falls back to a densify path.
    warn_on_densify: bool = True

    # Decomp-format addition auto-compaction: when the block-embedded
    # weights of a structural add would exceed this many elements AND the
    # exact standard-basis representation (weights = (dim,)**rank
    # coefficients, factors = identity) is smaller, the smaller form is
    # returned.  Bounds the exponential factor growth of long add/tensordot
    # chains at small dim while leaving genuinely low-rank decompositions
    # (dim**rank huge) untouched.  0 disables.
    decomp_autoreduce_elems: int = 65536


config = Config()


def _host_fingerprint() -> str:
    """Short stable fingerprint of this host's CPU (arch + feature flags).
    Used to key the persistent compile cache per machine image."""
    import hashlib
    import platform as _platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats = _platform.processor()
    h = hashlib.sha1(
        f"{_platform.machine()}|{feats}".encode()
    ).hexdigest()[:10]
    return f"host-{h}"


def enable_persistent_compile_cache() -> str | None:
    """Point JAX's persistent compilation cache at a local directory.

    Full-size programs compile in minutes through the axon remote-compile
    helper, and the worker-side cache is lost on every TPU-worker crash
    (measured: 573 s of window-1 compiles on a cold worker at the rank-6
    dim-100 flagship).  The JAX persistent cache stores the *compiled
    executable* on local disk keyed by HLO hash, and measured hits through
    the axon backend load in ~0.15 s (benchmarks/compile_cache_probe.py)
    — so each distinct program compiles once per machine, not once per
    worker lifetime.

    Called at package import.  Controls:
    - ``SYMTENSOR_COMPILE_CACHE=<dir>`` overrides the location;
    - ``SYMTENSOR_COMPILE_CACHE=0`` (or ``off``) disables;
    - a user-set ``jax_compilation_cache_dir`` is left untouched.

    The directory is suffixed with a HOST FINGERPRINT (machine arch + CPU
    feature flags): JAX's own cache key covers the platform and compiler
    version but not the host CPU features, so a cache directory shared
    across machine images can serve XLA:CPU executables compiled for a
    different microarchitecture (XLA warns this "could lead to execution
    errors such as SIGILL" — seen in the round-4 multichip dryrun).

    Returns the cache dir in use, or None when disabled/unavailable.
    """
    import os

    env = os.environ.get("SYMTENSOR_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none", "disable"):
        return None
    try:
        import jax

        current = jax.config.jax_compilation_cache_dir
        if current:
            return current
        base = env or os.path.join(
            os.path.expanduser("~"), ".cache", "symtensor_tpu", "jax_cache"
        )
        path = os.path.join(base, _host_fingerprint())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # anything under a second is cheaper to recompile than to store
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except Exception as e:  # never let cache plumbing break imports
        logger.debug("persistent compile cache unavailable: %s", e)
        return None
