"""Multi-host execution: distributed init + per-process device feeding.

Design (SURVEY §2.4 / §7.3.6): the one global invariant of ZeTT training is
that the per-batch SAMPLED TOKENIZER must be identical on every host. The
reference guarantees this by replicating host-0's whole batch through
process_allgather (train.py:1462-1465) — every other host's data work is
thrown away. Here every host instead constructs the identical global batch
deterministically (seeded language streams + per-batch collator seeds, see
zett_tpu/data), and `globalize_batch` materializes on each host exactly the
shards its own devices hold. Zero cross-host communication on the data path.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .sharding import BATCH_PSPECS, _pad_rank


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize — explicit args, or env/TPU-pod
    auto-detection when all args are None (the reference leaves the call
    commented out, train.py:46, relying on pre-provisioned TPU runtimes).

    Safe to call unconditionally: no-ops when already initialized, and a
    single-process auto-detect failure is swallowed.
    """
    from jax._src import distributed as _dist

    # NOTE: must not touch jax.process_count()/devices() here — any backend
    # query initializes XLA and makes distributed init impossible
    if _dist.global_state.client is not None:
        return
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except (ValueError, RuntimeError):
        if coordinator_address is not None:
            raise  # explicit request must not fail silently


def should_initialize_distributed(config: dict) -> bool:
    """The training CLI initializes distributed when the config carries a
    `distributed` section or the standard coordinator env is present."""
    return bool(
        config.get("distributed")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )


def batch_seed_for_step(base_seed: int, step: int) -> int:
    """Deterministic per-step seed shared by ALL hosts so tokenizer sampling
    stays globally consistent without any broadcast. The Collator derives its
    per-batch rng from the same (seed, counter) scheme."""
    return (base_seed * 1_000_003 + step * 7919) % (2**31 - 1)


def globalize_batch(
    host_batch: Dict[str, np.ndarray],
    mesh: Mesh,
    pspecs: Optional[Dict[str, P]] = None,
) -> Dict[str, jax.Array]:
    """Turn a host-global numpy batch (identical on every process) into
    global jax Arrays: each process materializes only the shards owned by
    its local devices (the per-process feeding the reference lacks —
    replaces device_put + allgather replication)."""
    pspecs = pspecs if pspecs is not None else BATCH_PSPECS
    out: Dict[str, jax.Array] = {}
    for k, v in host_batch.items():
        if not hasattr(v, "shape"):
            out[k] = v
            continue
        v = np.asarray(v)
        sharding = NamedSharding(mesh, _pad_rank(pspecs.get(k, P()), v))
        out[k] = jax.make_array_from_callback(v.shape, sharding, lambda idx, _v=v: _v[idx])
    return out


def make_global_batch(local_batch: Dict[str, np.ndarray], mesh: Mesh,
                      pspecs: Dict[str, P]) -> Dict[str, jax.Array]:
    """Assemble PER-PROCESS local shards into global arrays (for data
    pipelines that feed disjoint per-host data, e.g. eval over a corpus
    split across hosts). For the training path — where every host computes
    the identical global batch — use `globalize_batch`."""
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
