"""Evaluation: standalone perplexity/bpc CLI and the in-training eval loop."""

from .loop import eval_loop
from .perplexity import chunked_tokenize, evaluate_lm

__all__ = ["chunked_tokenize", "eval_loop", "evaluate_lm"]
