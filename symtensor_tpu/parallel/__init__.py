from .sharding import (
    make_mesh,
    poly_eval_batched_sharded,
    replicated,
    shard_flat,
)

__all__ = [
    "make_mesh",
    "poly_eval_batched_sharded",
    "replicated",
    "shard_flat",
]
