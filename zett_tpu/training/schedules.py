"""Two-phase LR schedules (reference: create_learning_rate_fn,
zett/utils.py:83-141): randomly-initialized params warm up first at
random_learning_rate, pretrained params stay at 0 until the second warmup
boundary; both then follow linear warmup(s) into cosine decay."""

from __future__ import annotations

import optax


def create_learning_rate_fn(cfg):
    warmup_steps = cfg.warmup_steps if isinstance(cfg.warmup_steps, list) else [cfg.warmup_steps]
    learning_rate = (
        cfg.learning_rate
        if isinstance(cfg.learning_rate, list)
        else [cfg.learning_rate] * len(warmup_steps)
    )
    random_lr = cfg.random_learning_rate or learning_rate[0]

    random_warmup_fn = optax.linear_schedule(
        init_value=0.0, end_value=random_lr, transition_steps=cfg.random_warmup_steps
    )
    warmup_fns = []
    boundaries = [cfg.random_warmup_steps]
    for i, boundary in enumerate(warmup_steps):
        warmup_fns.append(
            optax.linear_schedule(
                init_value=0.0,
                end_value=learning_rate[i],
                transition_steps=boundary - boundaries[-1],
            )
        )
        boundaries.append(boundary)

    decay_fn = optax.cosine_decay_schedule(
        init_value=learning_rate[-1],
        decay_steps=max(cfg.steps - warmup_steps[-1], 1),
        alpha=cfg.learning_rate_alpha,
    )
    join_boundaries = [cfg.random_warmup_steps, *warmup_steps]
    random_fn = optax.join_schedules(
        schedules=[random_warmup_fn, *warmup_fns, decay_fn], boundaries=join_boundaries
    )
    pretrained_fn = optax.join_schedules(
        schedules=[optax.constant_schedule(0.0), *warmup_fns, decay_fn],
        boundaries=join_boundaries,
    )
    return random_fn, pretrained_fn
