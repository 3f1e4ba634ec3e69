"""Fused merged-head attention core for the hypernet (Pallas/Mosaic).

The hypernet's production attention (models/hypernet.py
``_merged_head_attention``) merges the (seq, heads) axes into one and
computes all head pairs in a single batched matmul with the off-diagonal
head blocks masked to -inf — eliminating XLA's per-head relayouts. What
remains on the r4 trace (experiments/profiles/hypernet_r4.md) is ~16 ms/run
of ``bf16[8192,96,64]`` layout flips that XLA inserts between the merged
reshape producers and the dot_general operands, plus ~8.5 ms of HBM-bound
masked-softmax fusions over the (B, L·h, L·h) score plane.

This kernel fuses the merged attention CORE — scores, head-block mask,
key mask/bias, softmax, weights·V — into one VMEM-resident Pallas program.
The q/k/v/out projections stay in XLA (the r4 trace shows them at matmul
roofline). Crucially the kernel body contains NO reshapes or lane slicing:
it consumes the already-merged ``(B, L·h, d)`` operands directly, which is
what the remote Mosaic compiler can build (an earlier full-block variant
died on ``tpu.reshape vector<1024x768> -> vector<128x8x12x64>`` — lane-dim
splitting reshapes are unsupported).

Numerics follow ``_merged_head_attention`` exactly: scores accumulate f32
on the MXU and are cast to the compute dtype, scaled by 1/sqrt(d) in
compute dtype, masked with ``finfo.min`` via a single select, softmax in
f32, weights cast back before the PV matmul. The off-diagonal head blocks
underflow to exactly 0.0 in the softmax, so the result is numerically
identical to per-head attention.

Reference semantics: zett/model/hyper_roberta.py:104-210 (per-head
attention this formulation is exactly equivalent to).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def merged_attention_reference(qm, km, vm, kmask, kbias, num_heads):
    """Pure-JAX mirror of models/hypernet.py _merged_head_attention's core
    (deterministic path), for differential testing.

    qm: (B, Lq*h, d); km/vm: (B, Lk*h, d); kmask: (B, Lk*h) bool or None;
    kbias: (B, Lk*h) additive or None.
    """
    h = num_heads
    d = qm.shape[-1]
    dtype = qm.dtype
    scores = jnp.einsum("bqd,bkd->bqk", qm, km)
    scores = scores / jnp.sqrt(d).astype(scores.dtype)
    if kbias is not None:
        scores = scores + kbias.astype(scores.dtype)[:, None, :]
    same_head = (
        (jnp.arange(qm.shape[1]) % h)[:, None]
        == (jnp.arange(km.shape[1]) % h)[None, :]
    )
    valid = same_head[None]
    if kmask is not None:
        valid = valid & kmask[:, None, :]
    scores = jnp.where(valid, scores, jnp.finfo(scores.dtype).min)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bqk,bkd->bqd", weights, vm)


def _core_kernel(qm_ref, km_ref, vm_ref, kmask_ref, kbias_ref, out_ref, *,
                 num_heads: int, has_bias: bool):
    dtype = qm_ref.dtype
    qm = qm_ref[:]            # (TB, Lqh, d)
    km = km_ref[:]            # (TB, Lkh, d)
    Lqh = qm.shape[1]
    Lkh = km.shape[1]
    d = qm.shape[2]
    scores = jax.lax.dot_general(
        qm, km, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)           # (TB, Lqh, Lkh)
    scores = scores / jnp.sqrt(d).astype(dtype)
    if has_bias:
        scores = scores + kbias_ref[:].astype(dtype)[:, None, :]
    # head-block mask: merged index % h == head (position-major merge)
    rq = jax.lax.broadcasted_iota(jnp.int32, (Lqh, Lkh), 0) % num_heads
    rk = jax.lax.broadcasted_iota(jnp.int32, (Lqh, Lkh), 1) % num_heads
    valid = (rq == rk)[None] & (kmask_ref[:] > 0)[:, None, :]
    scores = jnp.where(valid, scores, jnp.finfo(dtype).min)
    s32 = scores.astype(jnp.float32)
    m = jnp.max(s32, axis=-1, keepdims=True)
    e = jnp.exp(s32 - m)
    weights = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
    out_ref[:] = jax.lax.dot_general(
        weights, vm_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def _pick_tile(B: int, Lqh: int, Lkh: int, d: int, itemsize: int) -> int:
    """Largest power-of-two batch tile keeping the score plane + operands
    within a conservative VMEM budget (~8 MB)."""
    budget = 8 * 1024 * 1024
    per_row = Lqh * Lkh * 4 * 2 + (Lqh + 2 * Lkh) * d * itemsize
    tile = 1
    while tile * 2 <= 512 and (tile * 2) * per_row <= budget:
        tile *= 2
    return tile


@functools.partial(
    jax.jit, static_argnames=("num_heads", "tile_b", "interpret")
)
def merged_attention_pallas(qm, km, vm, kmask=None, kbias=None, *,
                            num_heads: int, tile_b: int = 0,
                            interpret: bool = False):
    """Fused merged-head attention core.

    qm (B, Lqh, d), km/vm (B, Lkh, d); kmask (B, Lkh) bool (True = attend,
    None = all valid); kbias (B, Lkh) additive bias or None. Returns
    (B, Lqh, d). B is padded internally to the batch tile.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Lqh, d = qm.shape
    Lkh = km.shape[1]
    dtype = qm.dtype
    if kmask is None:
        kmask = jnp.ones((B, Lkh), jnp.bool_)
    has_bias = kbias is not None
    if kbias is None:
        kbias = jnp.zeros((B, 8), dtype)  # unused dummy operand
    kmaskf = kmask.astype(jnp.float32)

    if tile_b <= 0:
        tile_b = _pick_tile(B, Lqh, Lkh, d, np.dtype(dtype).itemsize)
    pad = (-B) % tile_b
    if pad:
        qm = jnp.pad(qm, ((0, pad), (0, 0), (0, 0)))
        km = jnp.pad(km, ((0, pad), (0, 0), (0, 0)))
        vm = jnp.pad(vm, ((0, pad), (0, 0), (0, 0)))
        # padded rows keep kmask all-zero: uniform softmax over min-scores,
        # rows are sliced off below (the max-subtraction keeps exp finite)
        kmaskf = jnp.pad(kmaskf, ((0, pad), (0, 0)))
        kbias = jnp.pad(kbias, ((0, pad), (0, 0)))
    Bp = B + pad

    grid = (Bp // tile_b,)
    q_spec = pl.BlockSpec((tile_b, Lqh, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((tile_b, Lkh, d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((tile_b, Lkh), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((tile_b, kbias.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_core_kernel, num_heads=num_heads,
                          has_bias=has_bias),
        out_shape=jax.ShapeDtypeStruct((Bp, Lqh, d), dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, mask_spec, bias_spec],
        out_specs=q_spec,
        interpret=interpret,
    )(qm, km, vm, kmaskf, kbias)
    return out[:B] if pad else out


# ---------------------------------------------------------------------------
# Full attention BLOCK kernel: q/k/v projections + merged-head core + output
# projection in ONE VMEM-resident program. The block boundary is then the
# LayerNorm output (layout-flexible elementwise producer/consumer), so XLA
# has no dot-layout conflict to resolve with copies — unlike the core-only
# kernel above, whose (B, L·h, d) operands XLA feeds through relayouts
# (measured: the 16 ms of copies just moved to the pallas boundary).
#
# Mosaic constraints shape the formulation (all probed on-chip, v5e):
#   - lane-dim SPLITTING reshapes ((TBL, H) -> (TB, L, h, d)) are
#     unsupported -> never reshape across the lane dim;
#   - 64-aligned lane SLICES (q[:, j*64:(j+1)*64]) ARE supported;
#   - sublane regroup/collapse reshapes and sublane/lane concatenation ARE
#     supported.
# So: dense (TBL,H)x(H,H) projections on the MXU (full lane utilization),
# then per-head lane slices assembled into a HEAD-MAJOR merged layout
# (index = head*L + pos) by sublane concat; one batched score matmul with
# block-diagonal masking (numerically identical to per-head attention —
# off-block entries underflow to exactly 0 in the softmax); PV matmul;
# lane-concat of the per-head context slices; dense output projection.
# ---------------------------------------------------------------------------


def attention_block_reference(x, mask, kbias, wq, bq, wk, bk, wv, bv, wo, bo,
                              num_heads):
    """Pure-JAX mirror of models/hypernet.py Attention (deterministic,
    self-attention): Dense projections in compute dtype + the merged-head
    core + output Dense. Used for differential tests and as the
    non-TPU branch under jax.lax.platform_dependent."""
    B, L, H = x.shape
    h = num_heads
    d = H // h
    q = x @ wq + bq
    k = x @ wk + bk
    v = x @ wv + bv
    qm = q.reshape(B, L * h, d)
    km = k.reshape(B, L * h, d)
    vm = v.reshape(B, L * h, d)
    kmask = jnp.repeat(mask, h, axis=-1) if mask is not None else None
    kb = jnp.repeat(kbias.astype(x.dtype), h, axis=-1) if kbias is not None else None
    out = merged_attention_reference(qm, km, vm, kmask, kb, h)
    return out.reshape(B, L, H) @ wo + bo


def _block_kernel(x_ref, maskf_ref, kbias_ref, wq_ref, bq_ref, wk_ref,
                  bk_ref, wv_ref, bv_ref, wo_ref, bo_ref, out_ref,
                  qm_ref, km_ref, vm_ref, ctx_ref, *,
                  num_heads: int, L: int, has_bias: bool, has_mask: bool):
    TB = x_ref.shape[0]
    H = x_ref.shape[2]
    h = num_heads
    d = H // h
    dtype = x_ref.dtype
    xf = x_ref[:].reshape(TB * L, H)

    def proj(w_ref, b_ref, m_ref):
        y = jax.lax.dot_general(
            xf, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype) + b_ref[:]
        # head-major merged layout: per-head lane slices (supported) stored
        # through a VMEM scratch at sublane offsets — a direct concatenate
        # of the slices trips Mosaic on their mixed lane-offset layouts,
        # while stores relayout implicitly
        for j in range(h):
            m_ref[:, j * L:(j + 1) * L, :] = (
                y[:, j * d:(j + 1) * d].reshape(TB, L, d)
            )
        return m_ref[:]  # (TB, h*L, d)

    qm = proj(wq_ref, bq_ref, qm_ref)
    km = proj(wk_ref, bk_ref, km_ref)
    vm = proj(wv_ref, bv_ref, vm_ref)

    scores = jax.lax.dot_general(
        qm, km, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)  # (TB, hL, hL)
    scores = scores / jnp.sqrt(d).astype(dtype)
    if has_bias:
        kb = jnp.concatenate([kbias_ref[:].astype(dtype)] * h, axis=1)
        scores = scores + kb[:, None, :]
    hL = h * L
    rq = jax.lax.broadcasted_iota(jnp.int32, (hL, hL), 0) // L
    rk = jax.lax.broadcasted_iota(jnp.int32, (hL, hL), 1) // L
    valid = (rq == rk)[None]
    if has_mask:
        maskt = jnp.concatenate([maskf_ref[:]] * h, axis=1) > 0
        valid = valid & maskt[:, None, :]
    scores = jnp.where(valid, scores, jnp.finfo(dtype).min)
    s32 = scores.astype(jnp.float32)
    m = jnp.max(s32, axis=-1, keepdims=True)
    e = jnp.exp(s32 - m)
    weights = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
    ctx = jax.lax.dot_general(
        weights, vm, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)  # (TB, hL, d)
    # un-merge back to (TBL, H) via lane-offset stores into scratch
    for j in range(h):
        ctx_ref[:, j * d:(j + 1) * d] = (
            ctx[:, j * L:(j + 1) * L, :].reshape(TB * L, d)
        )
    out = jax.lax.dot_general(
        ctx_ref[:], wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + bo_ref[:]
    out_ref[:] = out.reshape(TB, L, H)


def _pick_block_tile(L: int, H: int, num_heads: int, itemsize: int) -> int:
    hL = num_heads * L
    # per-row VMEM: x + out + q/k/v merged + ctx (compute dtype), two f32
    # score-plane temporaries (scores + exp)
    per_row = (2 * L * H + 4 * hL * (H // num_heads)) * itemsize + 2 * hL * hL * 4
    budget = 6 * 1024 * 1024
    tile = 8
    while tile * 2 <= 256 and (tile * 2) * per_row <= budget:
        tile *= 2
    return tile


@functools.partial(
    jax.jit, static_argnames=("num_heads", "tile_b", "interpret")
)
def attention_block_pallas(x, mask, kbias, wq, bq, wk, bk, wv, bv, wo, bo, *,
                           num_heads: int, tile_b: int = 0,
                           interpret: bool = False):
    """Fused attention block: x (B, L, H) -> (B, L, H).

    mask: (B, L) bool (True = attend) or None; kbias: (B, L) additive key
    bias (priors) or None. Weights are the Dense-compatible (H, H)/(H,)
    params in compute dtype. B is padded internally to the batch tile.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, H = x.shape
    dtype = x.dtype
    has_mask = mask is not None
    has_bias = kbias is not None
    maskf = (
        mask.astype(jnp.float32) if has_mask else jnp.ones((B, L), jnp.float32)
    )
    kbias = kbias if has_bias else jnp.zeros((B, L), dtype)
    bq2, bk2, bv2, bo2 = (b.reshape(1, H) for b in (bq, bk, bv, bo))

    if tile_b <= 0:
        tile_b = _pick_block_tile(L, H, num_heads, np.dtype(dtype).itemsize)
    pad = (-B) % tile_b
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        maskf = jnp.pad(maskf, ((0, pad), (0, 0)))
        kbias = jnp.pad(kbias, ((0, pad), (0, 0)))
    Bp = B + pad

    grid = (Bp // tile_b,)
    row_spec = pl.BlockSpec((tile_b, L, H), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((tile_b, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((H, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    hL = num_heads * L
    d = H // num_heads
    out = pl.pallas_call(
        functools.partial(_block_kernel, num_heads=num_heads, L=L,
                          has_bias=has_bias, has_mask=has_mask),
        out_shape=jax.ShapeDtypeStruct((Bp, L, H), dtype),
        grid=grid,
        in_specs=[row_spec, vec_spec, vec_spec, w_spec, b_spec, w_spec,
                  b_spec, w_spec, b_spec, w_spec, b_spec],
        out_specs=row_spec,
        scratch_shapes=[
            pltpu.VMEM((tile_b, hL, d), dtype),
            pltpu.VMEM((tile_b, hL, d), dtype),
            pltpu.VMEM((tile_b, hL, d), dtype),
            pltpu.VMEM((tile_b * L, H), dtype),
        ],
        interpret=interpret,
    )(x, maskf, kbias, wq, bq2, wk, bk2, wv, bv2, wo, bo2)
    return out[:B] if pad else out


# ---------------------------------------------------------------------------
# Full ENCODER LAYER kernel: attention block + residual LayerNorm + FFN
# (intermediate/gelu/output) + residual LayerNorm, all VMEM-resident. The
# hidden states never round-trip to HBM inside a layer: the only HBM
# traffic is the (B, L, H) layer input/output and the (grid-constant)
# weights — vs the XLA lowering's per-op activation streams and the
# f32 LayerNorm-stat fusions measured on the r4/r5 traces.
# ---------------------------------------------------------------------------


def layer_norm_flax_exact(x, scale, bias, eps, out_dtype):
    """Bit-exact replica of flax.linen.LayerNorm (force_float32_reductions,
    use_fast_variance — the defaults): f32 stats, rsqrt*scale before the
    multiply, f32 affine, cast at the end. Equality (0.0 in f32 and bf16)
    is pinned by tests/test_pallas_attention.py."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    mu2 = (xf * xf).mean(-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    y = (xf - mu) * mul + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _gelu(x, approximate: bool):
    import flax.linen as nn

    return nn.gelu(x, approximate=approximate)


def encoder_layer_reference(x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                            ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                            num_heads, eps, approximate_gelu):
    """Pure-JAX mirror of models/hypernet.py EncoderLayer (deterministic,
    no inter-token attention / adapters): the non-TPU branch and the
    differential-test oracle for the fused layer kernel."""
    attn = attention_block_reference(
        x, mask, None, wq, bq, wk, bk, wv, bv, wo, bo, num_heads
    )
    y1 = layer_norm_flax_exact(attn + x, ln1_s, ln1_b, eps, x.dtype)
    h = _gelu(y1 @ w1 + b1, approximate_gelu)
    h = h @ w2 + b2
    return layer_norm_flax_exact(h + y1, ln2_s, ln2_b, eps, x.dtype)


def _layer_kernel(x_ref, maskf_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                  bv_ref, wo_ref, bo_ref, ln1s_ref, ln1b_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref, ln2s_ref, ln2b_ref, out_ref,
                  qm_ref, km_ref, vm_ref, ctx_ref, *,
                  num_heads: int, L: int, eps: float, approximate_gelu: bool,
                  has_mask: bool):
    TB = x_ref.shape[0]
    H = x_ref.shape[2]
    h = num_heads
    d = H // h
    dtype = x_ref.dtype
    xf = x_ref[:].reshape(TB * L, H)

    def proj(w_ref, b_ref, m_ref):
        y = jax.lax.dot_general(
            xf, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype) + b_ref[:]
        for j in range(h):
            m_ref[:, j * L:(j + 1) * L, :] = (
                y[:, j * d:(j + 1) * d].reshape(TB, L, d)
            )
        return m_ref[:]

    qm = proj(wq_ref, bq_ref, qm_ref)
    km = proj(wk_ref, bk_ref, km_ref)
    vm = proj(wv_ref, bv_ref, vm_ref)

    scores = jax.lax.dot_general(
        qm, km, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    scores = scores / jnp.sqrt(d).astype(dtype)
    hL = h * L
    rq = jax.lax.broadcasted_iota(jnp.int32, (hL, hL), 0) // L
    rk = jax.lax.broadcasted_iota(jnp.int32, (hL, hL), 1) // L
    valid = (rq == rk)[None]
    if has_mask:
        maskt = jnp.concatenate([maskf_ref[:]] * h, axis=1) > 0
        valid = valid & maskt[:, None, :]
    scores = jnp.where(valid, scores, jnp.finfo(dtype).min)
    s32 = scores.astype(jnp.float32)
    m = jnp.max(s32, axis=-1, keepdims=True)
    e = jnp.exp(s32 - m)
    weights = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
    ctx = jax.lax.dot_general(
        weights, vm, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    for j in range(h):
        ctx_ref[:, j * d:(j + 1) * d] = (
            ctx[:, j * L:(j + 1) * L, :].reshape(TB * L, d)
        )
    attn = jax.lax.dot_general(
        ctx_ref[:], wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + bo_ref[:]

    y1 = layer_norm_flax_exact(
        attn + xf, ln1s_ref[:], ln1b_ref[:], eps, dtype
    )
    mid = jax.lax.dot_general(
        y1, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + b1_ref[:]
    mid = _gelu(mid, approximate_gelu)
    ffn = jax.lax.dot_general(
        mid, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + b2_ref[:]
    out = layer_norm_flax_exact(ffn + y1, ln2s_ref[:], ln2b_ref[:], eps, dtype)
    out_ref[:] = out.reshape(TB, L, H)


def _pick_layer_tile(L: int, H: int, I: int, num_heads: int,
                     itemsize: int) -> int:
    hL = num_heads * L
    d = H // num_heads
    per_row = (
        (2 * L * H + 4 * hL * d + 2 * L * I + 2 * L * H) * itemsize
        + 2 * hL * hL * 4
        + 2 * L * H * 4  # f32 LayerNorm temporaries
    )
    # measured on v5e (widths 8/16): tile 32 is fastest that still
    # compiles alongside the ~10 MB of grid-constant weights; 64 exhausts
    # VMEM
    budget = 9 * 1024 * 1024
    tile = 8
    while tile * 2 <= 32 and (tile * 2) * per_row <= budget:
        tile *= 2
    return tile


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "eps", "approximate_gelu", "tile_b",
                     "interpret"),
)
def encoder_layer_pallas(x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                         ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b, *,
                         num_heads: int, eps: float, approximate_gelu: bool,
                         tile_b: int = 0, interpret: bool = False):
    """Fused encoder layer: x (B, L, H) -> (B, L, H). mask (B, L) bool or
    None. LayerNorm scale/bias stay f32 (flax param dtype)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, H = x.shape
    I = w1.shape[1]
    dtype = x.dtype
    has_mask = mask is not None
    maskf = (
        mask.astype(jnp.float32) if has_mask else jnp.ones((B, L), jnp.float32)
    )
    bq2, bk2, bv2, bo2, b22 = (b.reshape(1, H) for b in (bq, bk, bv, bo, b2))
    b12 = b1.reshape(1, I)
    ln1s2, ln1b2, ln2s2, ln2b2 = (
        p.reshape(1, H).astype(jnp.float32)
        for p in (ln1_s, ln1_b, ln2_s, ln2_b)
    )

    if tile_b <= 0:
        tile_b = _pick_layer_tile(L, H, I, num_heads, np.dtype(dtype).itemsize)
    pad = (-B) % tile_b
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        maskf = jnp.pad(maskf, ((0, pad), (0, 0)))
    Bp = B + pad

    grid = (Bp // tile_b,)
    row_spec = pl.BlockSpec((tile_b, L, H), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((tile_b, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const2d(a, b):
        return pl.BlockSpec((a, b), lambda i: (0, 0), memory_space=pltpu.VMEM)

    hL = num_heads * L
    d = H // num_heads
    out = pl.pallas_call(
        functools.partial(_layer_kernel, num_heads=num_heads, L=L, eps=eps,
                          approximate_gelu=approximate_gelu,
                          has_mask=has_mask),
        out_shape=jax.ShapeDtypeStruct((Bp, L, H), dtype),
        grid=grid,
        in_specs=[row_spec, vec_spec,
                  const2d(H, H), const2d(1, H), const2d(H, H), const2d(1, H),
                  const2d(H, H), const2d(1, H), const2d(H, H), const2d(1, H),
                  const2d(1, H), const2d(1, H),
                  const2d(H, I), const2d(1, I), const2d(I, H), const2d(1, H),
                  const2d(1, H), const2d(1, H)],
        out_specs=row_spec,
        scratch_shapes=[
            pltpu.VMEM((tile_b, hL, d), dtype),
            pltpu.VMEM((tile_b, hL, d), dtype),
            pltpu.VMEM((tile_b, hL, d), dtype),
            pltpu.VMEM((tile_b * L, H), dtype),
        ],
        interpret=interpret,
    )(x, maskf, wq, bq2, wk, bk2, wv, bv2, wo, bo2, ln1s2, ln1b2,
      w1, b12, w2, b22, ln2s2, ln2b2)
    return out[:B] if pad else out


# ---------------------------------------------------------------------------
# Production gating: probe-once Mosaic availability through whatever
# toolchain is attached (the remote tunnel's compile helper has failed in
# past rounds; it must never take the production path down with it).
# ---------------------------------------------------------------------------

_PROBE_RESULT: dict = {}


def pallas_attention_mode() -> str:
    """ZETT_PALLAS_ATTENTION: '1' force-on, '0' off, unset/'auto' = probe."""
    return os.environ.get("ZETT_PALLAS_ATTENTION", "auto").lower()


def pallas_attention_available(feature: str = "block") -> bool:
    """True iff the fused `feature` ("block" = attention block, "layer" =
    full encoder layer, tanh-gelu only) should be used on this process's
    backend.

    'auto' compiles a tiny probe kernel once per (process, feature) on the
    TPU backend and caches the outcome; any compile/runtime failure
    disables that feature (the XLA formulation is the fallback, not an
    error). NB the Mosaic lowering has no erf/erfc (probed on v5e), so the
    exact-gelu ("gelu") layer variant is never probed — EncoderLayer gates
    the layer fusion to tanh-gelu configs and erf configs keep the fused
    attention block + XLA FFN.
    """
    mode = pallas_attention_mode()
    if mode in ("0", "off", "false"):
        return False
    if feature in _PROBE_RESULT:
        return _PROBE_RESULT[feature]
    try:
        tpus = [d for d in jax.devices() if d.platform == "tpu"]
        if not tpus:
            _PROBE_RESULT[feature] = False
            return False
        if mode in ("1", "on", "true", "force"):
            _PROBE_RESULT[feature] = True
            return True
        # pin the probe to the TPU: the first production trace can happen
        # inside a `jax.default_device(cpu)` context (param init), which
        # must not poison the cached verdict with a CPU-lowering error
        with jax.default_device(tpus[0]):
            h, d, L = 2, 64, 4
            H = h * d
            x = jnp.ones((8, L, H), jnp.bfloat16)
            mask = jnp.ones((8, L), jnp.bool_)
            w = jnp.ones((H, H), jnp.bfloat16) * 0.01
            b = jnp.zeros((H,), jnp.bfloat16)
            if feature == "layer":
                s = jnp.ones((H,), jnp.float32)
                z = jnp.zeros((H,), jnp.float32)
                out = encoder_layer_pallas(
                    x, mask, w, b, w, b, w, b, w, b, s, z, w, b, w, b, s, z,
                    num_heads=h, eps=1e-12, approximate_gelu=True,
                )
            else:
                out = attention_block_pallas(
                    x, mask, None, w, b, w, b, w, b, w, b, num_heads=h
                )
            jax.block_until_ready(out)
        _PROBE_RESULT[feature] = True
    except Exception as exc:  # noqa: BLE001 — any failure means "fall back"
        _PROBE_RESULT[feature] = False
        _PROBE_RESULT[feature + "_error"] = repr(exc)
    return _PROBE_RESULT[feature]
