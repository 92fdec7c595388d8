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


config = Config()
