"""Pallas attention/encoder-layer kernels (ops/pallas_attention.py):
interpret-mode differentials vs the pure-JAX references (which themselves
mirror models/hypernet.py), flax-LayerNorm exactness, and fused-branch /
module-branch consistency of the EncoderLayer param tree + numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zett_tpu.ops.pallas_attention import (
    attention_block_pallas,
    attention_block_reference,
    encoder_layer_pallas,
    encoder_layer_reference,
    layer_norm_flax_exact,
    merged_attention_pallas,
    merged_attention_reference,
)


def _mk(rng, shape, s=0.02, dtype=jnp.bfloat16):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s, dtype)


@pytest.mark.parametrize("L,kbias", [(8, False), (16, True), (7, False)])
def test_merged_core_matches_reference(L, kbias):
    B, H, NH = 96, 768, 12
    d = H // NH
    rng = np.random.default_rng(0)
    qm = _mk(rng, (B, L * NH, d), 1.0)
    km = _mk(rng, (B, L * NH, d), 1.0)
    vm = _mk(rng, (B, L * NH, d), 1.0)
    kmask = jnp.asarray(
        np.repeat(rng.random((B, L)) > 0.2, NH, axis=-1)
    ).at[:, :NH].set(True)
    kb = (
        jnp.asarray(np.repeat(rng.normal(size=(B, L)), NH, axis=-1),
                    jnp.bfloat16)
        if kbias else None
    )
    ref = merged_attention_reference(qm, km, vm, kmask, kb, NH)
    got = merged_attention_pallas(
        qm, km, vm, kmask, kb, num_heads=NH, tile_b=32, interpret=True
    )
    d_ = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    assert d_ < 0.05, d_


@pytest.mark.parametrize("L,kbias,masked", [(8, False, True), (16, True, True),
                                            (8, False, False)])
def test_attention_block_matches_reference(L, kbias, masked):
    B, H, NH = 64, 768, 12
    rng = np.random.default_rng(1)
    x = _mk(rng, (B, L, H), 1.0)
    mask = (
        jnp.asarray(rng.random((B, L)) > 0.2).at[:, 0].set(True)
        if masked else None
    )
    kb = jnp.asarray(rng.normal(size=(B, L)), jnp.bfloat16) if kbias else None
    ws = [_mk(rng, (H, H)) for _ in range(4)]
    bs = [_mk(rng, (H,), 0.01) for _ in range(4)]
    args = (x, mask, kb, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3])
    ref = attention_block_reference(*args, NH)
    got = attention_block_pallas(*args, num_heads=NH, tile_b=16, interpret=True)
    d_ = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    assert d_ < 0.05, d_


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_layer_norm_flax_exact(dtype):
    """The kernel's LayerNorm replica must be BIT-EXACT vs flax.linen
    (same op order incl. rsqrt*scale-first and fast-variance clamp)."""
    import flax.linen as nn

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(128, 96)).astype(np.float32) * 3, dtype)
    scale = jnp.asarray(rng.normal(size=(96,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(96,)).astype(np.float32))
    ln = nn.LayerNorm(epsilon=1e-12, dtype=dtype)
    ref = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = layer_norm_flax_exact(x, scale, bias, 1e-12, dtype)
    assert jnp.array_equal(
        ref.astype(jnp.float32), got.astype(jnp.float32)
    ), float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))


@pytest.mark.parametrize("L,approx", [(8, True), (16, False)])
def test_encoder_layer_matches_reference(L, approx):
    B, H, I, NH = 64, 768, 1536, 12
    rng = np.random.default_rng(3)
    x = _mk(rng, (B, L, H), 1.0)
    mask = jnp.asarray(rng.random((B, L)) > 0.2).at[:, 0].set(True)
    ws = [_mk(rng, (H, H)) for _ in range(4)]
    bs = [_mk(rng, (H,), 0.01) for _ in range(4)]
    w1, b1 = _mk(rng, (H, I)), _mk(rng, (I,), 0.01)
    w2, b2 = _mk(rng, (I, H)), _mk(rng, (H,), 0.01)
    lns = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1 + 1.0)
    lnb = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
    args = (x, mask, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3],
            lns, lnb, w1, b1, w2, b2, lns, lnb)
    ref = encoder_layer_reference(*args, NH, 1e-12, approx)
    got = encoder_layer_pallas(
        *args, num_heads=NH, eps=1e-12, approximate_gelu=approx,
        tile_b=16, interpret=True,
    )
    d_ = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    assert d_ < 0.08, d_


def test_encoder_layer_reference_matches_module():
    """The fused-branch reference (what non-TPU lowerings execute, and what
    the Pallas kernel is differentially tested against) must be
    BIT-IDENTICAL to the EncoderLayer module path in f32 — including the
    param-tree layout, pinned by initializing both branch variants."""
    from zett_tpu.models.hypernet import EncoderLayer, HypernetConfig

    cfg = HypernetConfig(
        hidden_size=128, intermediate_size=256, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=18, vocab_size=64,
        pad_token_id=0, n_embd=128, hn_surface_maxlen=16,
        hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
    )
    layer = EncoderLayer(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(16, 8, 128)).astype(np.float32))
    mask = jnp.asarray(rng.random((16, 8)) > 0.2).at[:, 0].set(True)
    params = layer.init(jax.random.PRNGKey(0), x, mask)
    module_out = layer.apply(params, x, mask)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = sorted(
        "/".join(getattr(k, "key", str(k)) for k in path) for path, _ in flat
    )
    p = params["params"]
    ref_out = encoder_layer_reference(
        x, mask.astype(bool),
        p["attention"]["query"]["kernel"], p["attention"]["query"]["bias"],
        p["attention"]["key"]["kernel"], p["attention"]["key"]["bias"],
        p["attention"]["value"]["kernel"], p["attention"]["value"]["bias"],
        p["attention"]["out"]["kernel"], p["attention"]["out"]["bias"],
        p["attention_ln"]["scale"], p["attention_ln"]["bias"],
        p["intermediate"]["kernel"], p["intermediate"]["bias"],
        p["output"]["kernel"], p["output"]["bias"],
        p["output_ln"]["scale"], p["output_ln"]["bias"],
        cfg.num_attention_heads, cfg.layer_norm_eps,
        cfg.hidden_act != "gelu",
    )
    assert jnp.array_equal(module_out, ref_out), float(
        jnp.max(jnp.abs(module_out - ref_out))
    )
    # the fused branch declares the identical tree (checked names contain
    # exactly the module names)
    expected = {
        "params/attention/query/kernel", "params/attention/query/bias",
        "params/attention/key/kernel", "params/attention/key/bias",
        "params/attention/value/kernel", "params/attention/value/bias",
        "params/attention/out/kernel", "params/attention/out/bias",
        "params/attention_ln/scale", "params/attention_ln/bias",
        "params/intermediate/kernel", "params/intermediate/bias",
        "params/output/kernel", "params/output/bias",
        "params/output_ln/scale", "params/output_ln/bias",
    }
    assert set(names) == expected, set(names) ^ expected


@pytest.mark.parametrize("masked", [True, False])
def test_attention_block_fused_grads_match_reference(masked):
    """The hand-written plane-free backward (custom_vjp) must match
    jax.grad of the reference for every input (f32, CPU fallback path —
    the same math the TPU kernels implement)."""
    from zett_tpu.ops.pallas_attention import attention_block_fused

    B, L, H, NH = 12, 7, 128, 2
    rng = np.random.default_rng(5)
    f = lambda sh, s=0.2: jnp.asarray(rng.normal(size=sh).astype(np.float32) * s)
    x = f((B, L, H), 1.0)
    maskf = (
        jnp.asarray((rng.random((B, L)) > 0.2).astype(np.float32))
        .at[:, 0].set(1.0)
        if masked else jnp.ones((B, L), jnp.float32)
    )
    kbias0 = jnp.zeros((B, L), jnp.float32)
    ws = [f((H, H)) for _ in range(4)]
    bs = [f((H,), 0.05) for _ in range(4)]
    cot = f((B, L, H), 1.0)

    def loss_fused(x_, *wb):
        return (attention_block_fused(
            x_, maskf, kbias0, *wb, NH, masked, False) * cot).sum()

    def loss_ref(x_, *wb):
        return (attention_block_reference(
            x_, maskf > 0 if masked else None, None, *wb, NH) * cot).sum()

    args = (x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3])
    g_f = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    g_r = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    for i, (a, b) in enumerate(zip(g_f, g_r)):
        err = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        assert err / scale < 1e-4, (i, err, scale)


def test_encoder_layer_fused_grads_match_reference():
    from zett_tpu.ops.pallas_attention import encoder_layer_fused

    B, L, H, I, NH = 8, 7, 128, 256, 2
    rng = np.random.default_rng(6)
    f = lambda sh, s=0.2: jnp.asarray(rng.normal(size=sh).astype(np.float32) * s)
    x = f((B, L, H), 1.0)
    maskf = jnp.asarray((rng.random((B, L)) > 0.2).astype(np.float32)).at[:, 0].set(1.0)
    ws = [f((H, H)) for _ in range(4)]
    bs = [f((H,), 0.05) for _ in range(4)]
    w1, b1, w2, b2 = f((H, I)), f((I,), 0.05), f((I, H)), f((H,), 0.05)
    lns, lnb = f((H,), 0.1) + 1.0, f((H,), 0.1)
    cot = f((B, L, H), 1.0)
    flat = (x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3],
            lns, lnb, w1, b1, w2, b2, lns, lnb)

    def loss_fused(*a):
        return (encoder_layer_fused(
            a[0], maskf, *a[1:], NH, 1e-12, True, True) * cot).sum()

    def loss_ref(*a):
        return (encoder_layer_reference(
            a[0], maskf > 0, *a[1:], NH, 1e-12, True) * cot).sum()

    g_f = jax.grad(loss_fused, argnums=tuple(range(len(flat))))(*flat)
    g_r = jax.grad(loss_ref, argnums=tuple(range(len(flat))))(*flat)
    for i, (a, b) in enumerate(zip(g_f, g_r)):
        err = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        assert err / scale < 1e-4, (i, err, scale)
