"""Fused attention block kernel (ops/pallas_attention.py): interpret-mode
differential vs the pure-JAX reference (which itself mirrors
models/hypernet.py Attention in bf16)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zett_tpu.ops.pallas_attention import (
    attention_block_pallas,
    attention_block_reference,
)


@pytest.mark.parametrize("L,tile_b", [(8, 64), (16, 32)])
def test_fused_attention_matches_reference(L, tile_b):
    B, H, NH = 128, 768, 12
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32), dtype=jnp.bfloat16)
    mask = jnp.asarray(rng.random((B, L)) > 0.2).at[:, 0].set(True)
    ws = [jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.02,
                      dtype=jnp.bfloat16) for _ in range(4)]
    bs = [jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.01,
                      dtype=jnp.bfloat16) for _ in range(4)]
    args = (ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3])
    ref = attention_block_reference(x, mask, *args, NH)
    got = attention_block_pallas(
        x, mask, *args, num_heads=NH, tile_b=tile_b, interpret=True
    )
    d = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    assert d < 0.05, d
