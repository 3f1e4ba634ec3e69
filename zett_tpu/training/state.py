"""TrainState carrying the dropout rng and frozen source embeddings
(reference: train.py:170-192)."""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax.training import train_state


class TrainState(train_state.TrainState):
    dropout_rng: jax.Array = None
    source_embeddings: Optional[Any] = None

    def replicate_rng(self):
        return self
