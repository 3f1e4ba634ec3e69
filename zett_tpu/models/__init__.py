"""Model layer: the hypernetwork and minimal frozen-backbone definitions."""

from .hypernet import (
    Hypernet,
    HypernetConfig,
    PassthroughHypernet,
    ProjectorBlock,
    Rescaler,
)
from .reference_io import load_reference_hypernet

__all__ = [
    "Hypernet",
    "HypernetConfig",
    "PassthroughHypernet",
    "ProjectorBlock",
    "Rescaler",
    "load_reference_hypernet",
]
