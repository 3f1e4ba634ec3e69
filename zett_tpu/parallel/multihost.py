"""Multi-host utilities: distributed init + per-process data feeding.

The reference replicates host-0's batch on every host via process_allgather
(train.py:1462-1465); the TPU-native design feeds each process its own shard
with jax.make_array_from_process_local_data (SURVEY §2.4). The one global
invariant is that the SAMPLED TOKENIZER must be identical across hosts —
guaranteed here by seed-synchronized sampling (every host derives the batch
seed from the global step), not by broadcasting.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """jax.distributed.initialize with TPU-pod auto-detection (the reference
    leaves this commented out, train.py:46; on TPU pods arguments resolve
    from the environment)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except (ValueError, RuntimeError):
        pass  # single-process run


def batch_seed_for_step(base_seed: int, step: int) -> int:
    """Deterministic per-step seed shared by ALL hosts so tokenizer sampling
    is globally consistent without any broadcast."""
    return (base_seed * 1_000_003 + step * 7919) % (2**31 - 1)


def make_global_batch(local_batch: Dict[str, np.ndarray], mesh: Mesh,
                      pspecs: Dict[str, P]) -> Dict[str, jax.Array]:
    """Assemble per-process local shards into global arrays."""
    out = {}
    for k, v in local_batch.items():
        if not hasattr(v, "shape"):
            out[k] = v
            continue
        spec = pspecs.get(k, P())
        sharding = NamedSharding(mesh, spec)
        out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
    return out


def process_slice(n: int) -> slice:
    """This process's contiguous shard of a length-n leading axis."""
    per = n // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
