"""Host data pipeline: datasets, collator, MLM masking."""

from .collator import Collator, build_sampled_tokenizer
from .config import DataConfig
from .datasets import TrainDataset, ValidDataset, language_probs_from_sizes
from .mlm import MLMCollator

__all__ = [
    "Collator",
    "DataConfig",
    "MLMCollator",
    "TrainDataset",
    "ValidDataset",
    "build_sampled_tokenizer",
    "language_probs_from_sizes",
]
