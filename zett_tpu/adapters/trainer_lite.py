"""Minimal torch fine-tuning loop shared by the downstream-eval runners
(replaces the HF `Trainer`/`AdapterTrainer` dependency of
zett/adapters/run_glue.py:610 and run_ner.py with an explicit, offline loop)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, Iterable, Optional

import numpy as np
import torch


@dataclass
class FitConfig:
    learning_rate: float = 1e-4
    num_train_epochs: float = 3.0
    per_device_batch_size: int = 32
    weight_decay: float = 0.0
    warmup_ratio: float = 0.06
    max_grad_norm: float = 1.0
    seed: int = 42
    logging_steps: int = 50
    max_steps: Optional[int] = None  # overrides epochs when set


def make_batches(
    features: Dict[str, np.ndarray], batch_size: int, shuffle: bool, seed: int
) -> Iterable[Dict[str, torch.Tensor]]:
    n = len(next(iter(features.values())))
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        yield {k: torch.as_tensor(v[idx]) for k, v in features.items()}


def fit(
    model: torch.nn.Module,
    train_features: Dict[str, np.ndarray],
    config: FitConfig,
    log: Callable[[str], None] = print,
) -> Dict[str, float]:
    """Train with AdamW + linear warmup/decay over trainable params only."""
    torch.manual_seed(config.seed)
    model.train()
    params = [p for p in model.parameters() if p.requires_grad]
    opt = torch.optim.AdamW(
        params, lr=config.learning_rate, weight_decay=config.weight_decay
    )
    n = len(next(iter(train_features.values())))
    steps_per_epoch = max(1, math.ceil(n / config.per_device_batch_size))
    total_steps = config.max_steps or int(steps_per_epoch * config.num_train_epochs)
    warmup = max(1, int(total_steps * config.warmup_ratio))

    def lr_lambda(step):
        if step < warmup:
            return step / warmup
        return max(0.0, (total_steps - step) / max(1, total_steps - warmup))

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda)
    step = 0
    last_loss = float("nan")
    done = False
    for epoch in range(math.ceil(config.num_train_epochs)):
        if done:
            break
        for batch in make_batches(
            train_features, config.per_device_batch_size, True, config.seed + epoch
        ):
            out = model(**batch)
            loss = out.loss if hasattr(out, "loss") else out[0]
            loss.backward()
            torch.nn.utils.clip_grad_norm_(params, config.max_grad_norm)
            opt.step()
            sched.step()
            opt.zero_grad(set_to_none=True)
            step += 1
            last_loss = float(loss.detach())
            if step % config.logging_steps == 0:
                log(f"step {step}/{total_steps} loss {last_loss:.4f}")
            if step >= total_steps:
                done = True
                break
    return {"train_steps": step, "final_loss": last_loss}


@torch.no_grad()
def predict(
    model: torch.nn.Module,
    features: Dict[str, np.ndarray],
    batch_size: int,
) -> np.ndarray:
    model.eval()
    logits = []
    feats = {k: v for k, v in features.items() if k != "labels"}
    for batch in make_batches(feats, batch_size, False, 0):
        out = model(**batch)
        logits.append((out.logits if hasattr(out, "logits") else out[0]).float().numpy())
    return np.concatenate(logits, axis=0)
