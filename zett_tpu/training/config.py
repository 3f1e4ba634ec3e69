"""Training configuration (reference: TrainingArguments/ModelArguments,
train.py:81-164)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Union


@dataclass
class TrainingConfig:
    output_dir: str = "out"
    steps: int = 1000
    learning_rate: Union[float, List[float]] = 3e-4
    random_learning_rate: Optional[float] = None
    warmup_steps: Union[int, List[int]] = 100
    random_warmup_steps: int = 0
    learning_rate_alpha: float = 0.1
    weight_decay: float = 0.01
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: Optional[float] = 1.0
    use_adafactor: bool = False
    gradient_accumulation_steps: int = 1
    loss: str = "clm"  # "clm" | "mlm"
    lexical_loss_weight: float = 0.0
    lexical_loss_kind: str = "mse"  # "mse" | "rmse" | "huber"
    apply_lexical_loss_to_init: bool = False
    learnable_bias: bool = False
    add_target_priors_to_bias: bool = False
    identity_steps: int = 0
    backbone_training: str = "no"  # "no" | "full"
    run_backbone_in_training_mode: bool = False
    reinit_projectors: bool = False
    seed: int = 0
    logging_steps: int = 50
    save_steps: int = 500
    save_state: bool = True  # periodic checkpoints include opt state/step/rng
    eval_steps: int = 500
    eval_at_step_zero: bool = False
    dtype: str = "float32"
    n_model_parallel: int = 1
    # rematerialize the hypernet forward in the backward pass
    # (jax.checkpoint): its activations live on the 32k-row vocab axis and
    # dominate HBM at the reference shape — the step runs at 15.7/15.75 GB
    # without this (see experiments/profiles/hypernet_r3.md)
    remat_hypernet: bool = False
    # chunked linear-cross-entropy: compute CLM logits per position-chunk
    # from the final hidden states inside a rematerialized scan, so the
    # (B, L, vocab) logit/grad pair never materializes (that pair is the
    # single-chip batch ceiling at 32k vocab). 0 = off; typical 16-32.
    # CLM (gpt2/llama/mistral/gemma/xglm) and MLM (roberta/xlm-roberta,
    # per-chunk lm_head transform) families.
    loss_chunk_size: int = 0
    # rematerialize each backbone block in the backward pass (gpt2/llama/
    # roberta families): drops the per-layer activations that bound the LM
    # batch once loss_chunk_size removed the logits
    remat_backbone: bool = False
    # batches prepared + device_put AHEAD of the running step by a
    # background thread (Trainer.fit): overlaps the host collate +
    # host->device transfer with device compute. The reference instead
    # serializes next(dataloader) with the step and compensates with 64
    # workers (train.py:159,1425-1461). 0 disables.
    prefetch_batches: int = 2
