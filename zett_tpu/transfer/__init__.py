"""Zero-shot transfer: hypernet inference over a target vocabulary."""

from .core import batched_inference, get_sample_indices, transfer

__all__ = ["batched_inference", "get_sample_indices", "transfer"]
