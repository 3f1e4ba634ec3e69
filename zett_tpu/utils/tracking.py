"""Optional experiment-tracking hook (reference: wandb init/log on process 0,
train.py:1297-1305).

metrics.jsonl remains the offline record of truth; a tracker mirrors the
exact same dict to wandb or tensorboard when the library is importable and
silently no-ops otherwise — training must never depend on a tracking
backend being installed (this environment has neither).

Usage:
    tracker = build_tracker("wandb", run_name="v7:gpt2", config={...})
    tracker.log(step, metrics)   # only numeric values are forwarded
    tracker.finish()
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class NullTracker:
    """The default: records nothing (metrics.jsonl is always written)."""

    name = "none"

    def log(self, step: int, metrics: Dict) -> None:
        pass

    def finish(self) -> None:
        pass


class WandbTracker:
    name = "wandb"

    def __init__(self, run_name: Optional[str], config: Optional[dict], wandb_module):
        self._wandb = wandb_module
        self._run = wandb_module.init(name=run_name, config=config or {})

    def log(self, step: int, metrics: Dict) -> None:
        numeric = {
            k: v for k, v in metrics.items() if isinstance(v, (int, float))
        }
        self._wandb.log(numeric, step=step)

    def finish(self) -> None:
        self._wandb.finish()


class TensorboardTracker:
    name = "tensorboard"

    def __init__(self, log_dir: str, writer_cls):
        self._writer = writer_cls(log_dir=log_dir)

    def log(self, step: int, metrics: Dict) -> None:
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                self._writer.add_scalar(k, v, global_step=step)
        self._writer.flush()

    def finish(self) -> None:
        self._writer.close()


def build_tracker(
    kind: Optional[str],
    run_name: Optional[str] = None,
    config: Optional[dict] = None,
    log_dir: str = "out/tb",
):
    """kind: "wandb" | "tensorboard" | "none"/None. Falls back to the
    NullTracker (with a warning) when the requested library is absent."""
    if not kind or kind == "none":
        return NullTracker()
    if kind == "wandb":
        try:
            import wandb  # type: ignore
        except ImportError:
            logger.warning("tracker 'wandb' requested but wandb is not installed; disabled")
            return NullTracker()
        return WandbTracker(run_name, config, wandb)
    if kind == "tensorboard":
        writer_cls = None
        try:
            from torch.utils.tensorboard import SummaryWriter as writer_cls  # type: ignore
        except ImportError:
            try:
                from tensorboardX import SummaryWriter as writer_cls  # type: ignore
            except ImportError:
                pass
        if writer_cls is None:
            logger.warning(
                "tracker 'tensorboard' requested but no SummaryWriter is available; disabled"
            )
            return NullTracker()
        return TensorboardTracker(log_dir, writer_cls)
    raise ValueError(f"unknown tracker kind {kind!r} (wandb | tensorboard | none)")
