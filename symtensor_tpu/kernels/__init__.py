from .poly_eval import poly_eval_flat, poly_eval_flat_batched

__all__ = ["poly_eval_flat", "poly_eval_flat_batched"]
