from .sharding import (
    make_mesh,
    tensordot_sharded,
    poly_eval_batched_sharded,
    poly_eval_batched_sharded_grouped,
    replicated,
    shard_flat,
    shard_group_views,
)

__all__ = [
    "make_mesh",
    "tensordot_sharded",
    "poly_eval_batched_sharded",
    "poly_eval_batched_sharded_grouped",
    "replicated",
    "shard_flat",
    "shard_group_views",
]
