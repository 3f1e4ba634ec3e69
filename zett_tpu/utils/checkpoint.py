"""Portable orbax restore: load a checkpoint onto THIS host's devices
regardless of the platform/topology it was saved on.

A bare ``StandardCheckpointer().restore(path)`` replays the SAVED sharding
metadata, which names the writer's devices — restoring a pod- or
CPU-written checkpoint on a different machine then fails with "Device ...
was not found in jax.local_devices()". The training engine always restores
into explicit abstract targets (engine.py restore_checkpoint); the
inference CLIs restore trees whose structure is only known from the
checkpoint itself, so this helper builds the abstract target from the
checkpoint's own metadata (shape/dtype only, shardings dropped) and lets
orbax place the arrays on the default device. Train-on-pod →
transfer-on-workstation is the normal ZeTT workflow (reference
scripts/transfer.py loads msgpack bytes, which had no device metadata to
begin with)."""

from __future__ import annotations


def restore_params_portable(path: str):
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    meta = ckptr.metadata(path)
    # newer orbax wraps the tree in StepMetadata(.item_metadata)
    meta = getattr(meta, "item_metadata", meta)

    def is_array_meta(x):
        return hasattr(x, "shape") and hasattr(x, "dtype")

    # fully-replicated sharding on this host's default device: abstract
    # leaves must carry a CONCRETE sharding for orbax to deserialize
    dev = jax.devices()[0]
    sharding = jax.sharding.SingleDeviceSharding(dev)
    abstract = jax.tree_util.tree_map(
        lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype,
                                       sharding=sharding),
        meta,
        is_leaf=is_array_meta,
    )
    return ckptr.restore(path, abstract)
