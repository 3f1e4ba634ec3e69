"""Model layer: the hypernetwork and minimal frozen-backbone definitions."""

from .hypernet import (
    Hypernet,
    HypernetConfig,
    PassthroughHypernet,
    ProjectorBlock,
    Rescaler,
)

__all__ = [
    "Hypernet",
    "HypernetConfig",
    "PassthroughHypernet",
    "ProjectorBlock",
    "Rescaler",
]
