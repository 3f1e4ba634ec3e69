"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from zett_tpu.parallel import (
    BACKBONE_RULES,
    HYPERNET_RULES,
    batch_pspecs,
    make_mesh,
    pspec_tree_ranked,
    resolve_pspec,
    make_mesh,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh(n_data=4, n_model=2)


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 4, "model": 2}


def test_resolve_rules():
    assert resolve_pspec(
        ("encoder", "layer_0", "attention", "query", "kernel"), HYPERNET_RULES
    ) == P(None, "model")
    assert resolve_pspec(
        ("encoder", "layer_1", "output", "kernel"), HYPERNET_RULES
    ) == P("model", None)
    # default replicate
    assert resolve_pspec(("encoder", "embeddings_ln", "scale"), HYPERNET_RULES) == P()


def test_backbone_rules_llama():
    rules = BACKBONE_RULES["llama"]
    assert resolve_pspec(
        ("model", "layers_3", "self_attn", "q_proj", "kernel"), rules
    ) == P(None, "model")
    assert resolve_pspec(
        ("model", "layers_3", "mlp", "down_proj", "kernel"), rules
    ) == P("model", None)


def test_hypernet_params_shard_and_run(mesh):
    """Init a small hypernet, shard its params over the mesh, run jit fwd."""
    from zett_tpu.models import Hypernet, HypernetConfig
    from zett_tpu.parallel.sharding import shard_tree

    cfg = HypernetConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=16, vocab_size=128,
        pad_token_id=0, n_embd=16, hn_surface_maxlen=8,
        hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
    )
    model = Hypernet(cfg)
    sf = jnp.asarray(
        np.random.default_rng(0).integers(1, 128, size=(16, 8)).astype(np.int32)
    )
    priors = jnp.zeros(16)
    params = model.init(jax.random.PRNGKey(0), sf, priors)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), pspec_tree_ranked(params, HYPERNET_RULES)
    )
    params = jax.device_put(params, shardings)

    @jax.jit
    def fwd(p, sf, priors):
        return model.apply(p, sf, priors)[0]

    sf_sharded = jax.device_put(sf, NamedSharding(mesh, P("data", None)))
    out = fwd(params, sf_sharded, priors)
    assert out.shape == (16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_shard_batch(mesh):
    batch = {
        "input_ids": np.zeros((8, 16), dtype=np.int32),
        "target_surface_forms": np.zeros((64, 8), dtype=np.int32),
        "target_priors": np.zeros(64, dtype=np.float32),
        "lang_index": np.array(0),
        "lang_code": "en",
    }
    sharded = shard_batch(batch, mesh)
    assert sharded["lang_code"] == "en"
    specs = batch_pspecs(batch)
    assert specs["input_ids"] == P("data", None)
    # the vocab batch is split over "data": each device holds 64/4 rows
    shard_shapes = [s.data.shape for s in sharded["target_surface_forms"].addressable_shards]
    assert all(s == (16, 8) for s in shard_shapes)
