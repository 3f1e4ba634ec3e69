"""Fused Pallas/Mosaic kernels for the hypernet's merged-head attention.

Four tiers, all differential-tested against pure-JAX references that are
themselves bit-checked against models/hypernet.py (tests/
test_pallas_attention.py), each behind a probe-once availability gate with
the XLA formulation as the per-platform fallback:

1. ``merged_attention_pallas`` — the attention CORE on already-merged
   ``(B, L·h, d)`` operands. Measured a NULL in context (XLA moves the
   relayout copies to the kernel's own operand boundary) — kept as the
   building block of tier 4 and for tests.
2. ``attention_block_pallas`` — q/k/v projections + core + output
   projection. The block boundary is the layout-flexible LayerNorm
   output, so the boundary copies disappear.
3. ``encoder_layer_pallas`` — the whole encoder layer (attention block +
   residual LayerNorms + FFN) VMEM-resident; hidden states never touch
   HBM inside a layer. Production inference path: 91.5 -> 76.0 ms/32k
   vocab on v5e (experiments/profiles/hypernet_r5.md). Tier 2/3 get
   ``custom_vjp`` wrappers (plane-free hand-written backward for the
   block; recompute-through-the-block for the layer) so the fused forward
   stays valid under ``jax.grad``.
4. ``merged_attention_train`` — custom_vjp core with Pallas forward AND
   backward + in-kernel seeded dropout (deterministic Mosaic PRNG). The
   score plane never exists in HBM in either direction. Measured
   speed-NEUTRAL inside the real train step (the removed plane fusions
   overlapped the copy/DMA critical path — trace-backed null result in
   hypernet_r5.md), so the Trainer routes the XLA formulation via the
   models' ``inference=False`` flag; ZETT_PALLAS_TRAIN=1 re-enables.

Mosaic constraints that shaped the formulations (all probed live on v5e
through the remote tunnel): lane-dim-splitting reshapes
(``(TBL, H) -> (TB, L, h, d)``) are unsupported; 64-aligned lane SLICES
are supported; sublane regroups need L % 8 == 0 (callers pad with masked
positions — exact); concatenating slices with mixed lane offsets trips
layout inference (stores through VMEM scratch relayout instead);
``tpu.matmul`` takes at most ONE batch dim; no erf/erfc (exact-gelu
configs stop at tier 2).

Numerics follow ``_merged_head_attention`` exactly: scores accumulate f32
on the MXU and are cast to the compute dtype, scaled by 1/sqrt(d) in
compute dtype, masked with ``finfo.min`` via a single select, softmax in
f32, weights cast back before the PV matmul. The off-diagonal head blocks
underflow to exactly 0.0 in the softmax, so the result is numerically
identical to per-head attention; the in-kernel LayerNorm replica is
bit-exact vs flax.linen.LayerNorm.

Reference semantics: zett/model/hyper_roberta.py:104-210 (per-head
attention these formulations are exactly equivalent to).
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
# Differentiable merged-head core (training path): custom_vjp with Pallas
# forward AND backward kernels. Flash-attention-style for the hypernet's
# regime — the (B, L·h, L·h) score plane lives only in VMEM in BOTH
# directions and the softmax weights are never saved as residuals (the
# backward kernel recomputes them from q/k/v). On the r4 train-step trace
# the plane's scale/mask/softmax fusions are the largest line
# (266 ms/step at batch 128: fwd + remat recompute + bwd all re-stream the
# (32896,84,84) tensor through HBM); this kernel removes that traffic and
# the residual memory.
#
# Dropout runs IN-KERNEL with the Mosaic PRNG, seeded per (call, grid
# tile): forward and backward regenerate the identical keep mask from the
# same seed, so gradients are exact for the sampled mask. The stream
# differs from jax.random.bernoulli's, so a Pallas-core run is a different
# (equally distributed) draw than an XLA-path run — but it is
# deterministic given the training rng, which preserves bit-identical
# checkpoint resume. prng_random_bits yields int32: a keep-probability p
# maps to the signed threshold round(p*2^32) - 2^31 (uniform over the full
# signed range).
# ---------------------------------------------------------------------------


def _dropout_threshold(rate: float) -> int:
    keep = 1.0 - rate
    return int(min(2**32 - 1, round(keep * 2**32))) - 2**31


def _core_train_fwd_kernel(seed_ref, qm_ref, km_ref, vm_ref, kmask_ref,
                           out_ref, *, num_heads: int, rate: float):
    from jax.experimental.pallas import tpu as pltpu

    dtype = qm_ref.dtype
    qm = qm_ref[:]
    km = km_ref[:]
    TB, Lqh, d = qm.shape
    Lkh = km.shape[1]
    scores = jax.lax.dot_general(
        qm, km, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    scores = scores / jnp.sqrt(d).astype(dtype)
    h = num_heads
    rq = jax.lax.broadcasted_iota(jnp.int32, (Lqh, Lkh), 0) % h
    rk = jax.lax.broadcasted_iota(jnp.int32, (Lqh, Lkh), 1) % h
    valid = (rq == rk)[None] & (kmask_ref[:] > 0)[:, None, :]
    scores = jnp.where(valid, scores, jnp.finfo(dtype).min)
    s32 = scores.astype(jnp.float32)
    m = jnp.max(s32, axis=-1, keepdims=True)
    e = jnp.exp(s32 - m)
    weights = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
    if rate > 0.0:
        import jax.experimental.pallas as pl

        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        bits = pltpu.prng_random_bits((TB, Lqh, Lkh))
        keep = bits < jnp.int32(_dropout_threshold(rate))
        weights = jnp.where(
            keep, weights / jnp.asarray(1.0 - rate, dtype),
            jnp.asarray(0.0, dtype),
        )
    out_ref[:] = jax.lax.dot_general(
        weights, vm_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def _core_train_bwd_kernel(seed_ref, qm_ref, km_ref, vm_ref, kmask_ref,
                           dout_ref, dqm_ref, dkm_ref, dvm_ref, *,
                           num_heads: int, rate: float):
    from jax.experimental.pallas import tpu as pltpu

    dtype = qm_ref.dtype
    qm = qm_ref[:]
    km = km_ref[:]
    dout = dout_ref[:]
    TB, Lqh, d = qm.shape
    Lkh = km.shape[1]
    inv_sqrt_d = (1.0 / np.sqrt(d)).astype(np.float32)
    # recompute the softmax weights (identical op order to forward)
    scores = jax.lax.dot_general(
        qm, km, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    scores = scores / jnp.sqrt(d).astype(dtype)
    h = num_heads
    rq = jax.lax.broadcasted_iota(jnp.int32, (Lqh, Lkh), 0) % h
    rk = jax.lax.broadcasted_iota(jnp.int32, (Lqh, Lkh), 1) % h
    valid = (rq == rk)[None] & (kmask_ref[:] > 0)[:, None, :]
    scores = jnp.where(valid, scores, jnp.finfo(dtype).min)
    s32 = scores.astype(jnp.float32)
    m = jnp.max(s32, axis=-1, keepdims=True)
    e = jnp.exp(s32 - m)
    w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
    if rate > 0.0:
        import jax.experimental.pallas as pl

        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        bits = pltpu.prng_random_bits((TB, Lqh, Lkh))
        keep = bits < jnp.int32(_dropout_threshold(rate))
        scale = jnp.asarray(1.0 / (1.0 - rate), dtype)
        wd = jnp.where(keep, w * scale, jnp.asarray(0.0, dtype))
    else:
        wd = w
    # dvm = wd^T · dout  (contract the query axis)
    dvm_ref[:] = jax.lax.dot_general(
        wd, dout, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    # d(wd) = dout · vm^T
    dwd = jax.lax.dot_general(
        dout, vm_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TB, Lqh, Lkh) f32
    if rate > 0.0:
        dw = jnp.where(keep, dwd * jnp.float32(1.0 / (1.0 - rate)),
                       jnp.float32(0.0))
    else:
        dw = dwd
    # softmax backward in f32: ds = w * (dw - sum_k dw*w)
    w32 = w.astype(jnp.float32)
    ds = w32 * (dw - jnp.sum(dw * w32, axis=-1, keepdims=True))
    ds = (ds * inv_sqrt_d).astype(dtype)
    dqm_ref[:] = jax.lax.dot_general(
        ds, km, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    dkm_ref[:] = jax.lax.dot_general(
        ds, qm, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def _core_train_tiles(B, Lqh, Lkh, d, itemsize):
    """ONE tile size for forward AND backward: the in-kernel dropout mask
    is regenerated from (seed, program_id) with a (TB, Lqh, Lkh) draw, so
    fwd/bwd MUST tile identically or the backward would scale/zero
    different entries than the forward dropped. Sized for the backward's
    VMEM footprint (5 score-plane temporaries — the larger of the two)."""
    n_planes = 5
    per_row = (3 * Lkh + Lqh) * d * itemsize + n_planes * Lqh * Lkh * 4
    budget = 6 * 1024 * 1024
    tile = 8
    while tile * 2 <= 256 and (tile * 2) * per_row <= budget:
        tile *= 2
    return tile


def _core_train_fwd_pallas(qm, km, vm, kmaskf, seed, num_heads, rate,
                           interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Lqh, d = qm.shape
    Lkh = km.shape[1]
    dtype = qm.dtype
    tile_b = _core_train_tiles(B, Lqh, Lkh, d, np.dtype(dtype).itemsize)
    pad = (-B) % tile_b
    if pad:
        qm, km, vm = (jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
                      for a in (qm, km, vm))
        kmaskf = jnp.pad(kmaskf, ((0, pad), (0, 0)))
    Bp = B + pad
    q_spec = pl.BlockSpec((tile_b, Lqh, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((tile_b, Lkh, d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((tile_b, Lkh), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_core_train_fwd_kernel, num_heads=num_heads,
                          rate=rate),
        out_shape=jax.ShapeDtypeStruct((Bp, Lqh, d), dtype),
        grid=(Bp // tile_b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  q_spec, kv_spec, kv_spec, m_spec],
        out_specs=q_spec,
        interpret=interpret,
    )(seed.reshape(1), qm, km, vm, kmaskf)
    return out[:B] if pad else out


def _core_train_bwd_pallas(qm, km, vm, kmaskf, seed, dout, num_heads, rate,
                           interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Lqh, d = qm.shape
    Lkh = km.shape[1]
    dtype = qm.dtype
    tile_b = _core_train_tiles(B, Lqh, Lkh, d, np.dtype(dtype).itemsize)
    pad = (-B) % tile_b
    if pad:
        qm, km, vm, dout = (jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
                            for a in (qm, km, vm, dout))
        kmaskf = jnp.pad(kmaskf, ((0, pad), (0, 0)))
    Bp = B + pad
    q_spec = pl.BlockSpec((tile_b, Lqh, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((tile_b, Lkh, d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((tile_b, Lkh), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    dqm, dkm, dvm = pl.pallas_call(
        functools.partial(_core_train_bwd_kernel, num_heads=num_heads,
                          rate=rate),
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Lqh, d), dtype),
            jax.ShapeDtypeStruct((Bp, Lkh, d), dtype),
            jax.ShapeDtypeStruct((Bp, Lkh, d), dtype),
        ],
        grid=(Bp // tile_b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  q_spec, kv_spec, kv_spec, m_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        interpret=interpret,
    )(seed.reshape(1), qm, km, vm, kmaskf, dout)
    if pad:
        dqm, dkm, dvm = dqm[:B], dkm[:B], dvm[:B]
    return dqm, dkm, dvm


def _core_train_fallback(qm, km, vm, kmaskf, seed, num_heads, rate):
    """Differentiable non-TPU branch: identical math with a seeded
    jax.random dropout mask (a different — equally distributed — stream
    than the Mosaic PRNG; each platform is internally fwd/bwd-consistent)."""
    out = merged_attention_reference(qm, km, vm, kmaskf > 0, None, num_heads)
    if rate > 0.0:
        # reference semantics: mask the softmax weights. Recreate them to
        # apply dropout exactly as _merged_head_attention does.
        h = num_heads
        d = qm.shape[-1]
        dtype = qm.dtype
        scores = jnp.einsum("bqd,bkd->bqk", qm, km)
        scores = scores / jnp.sqrt(d).astype(scores.dtype)
        same_head = (
            (jnp.arange(qm.shape[1]) % h)[:, None]
            == (jnp.arange(km.shape[1]) % h)[None, :]
        )
        valid = same_head[None] & (kmaskf > 0)[:, None, :]
        scores = jnp.where(valid, scores, jnp.finfo(scores.dtype).min)
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed.astype(jnp.uint32))
        keep = jax.random.bernoulli(key, 1.0 - rate, w.shape)
        w = jnp.where(keep, w / jnp.asarray(1.0 - rate, dtype),
                      jnp.asarray(0.0, dtype))
        out = jnp.einsum("bqk,bkd->bqd", w, vm)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def merged_attention_train(qm, km, vm, kmaskf, seed, num_heads, rate):
    """Differentiable merged-head attention core with in-core dropout.

    qm (B, Lh, d), km/vm (B, Lh, d), kmaskf (B, Lh) f32 {0,1}, seed ()
    int32. Gradients flow to qm/km/vm only."""
    out, _ = _merged_attention_train_fwd(qm, km, vm, kmaskf, seed,
                                         num_heads, rate)
    return out


def _merged_attention_train_fwd(qm, km, vm, kmaskf, seed, num_heads, rate):
    out = jax.lax.platform_dependent(
        tpu=lambda: _core_train_fwd_pallas(
            qm, km, vm, kmaskf, seed, num_heads, rate
        ),
        default=lambda: _core_train_fallback(
            qm, km, vm, kmaskf, seed, num_heads, rate
        ),
    )
    return out, (qm, km, vm, kmaskf, seed)


def _merged_attention_train_bwd(num_heads, rate, res, dout):
    qm, km, vm, kmaskf, seed = res

    def fallback():
        _, vjp = jax.vjp(
            lambda q, k, v: _core_train_fallback(
                q, k, v, kmaskf, seed, num_heads, rate
            ),
            qm, km, vm,
        )
        return vjp(dout)

    dqm, dkm, dvm = jax.lax.platform_dependent(
        tpu=lambda: _core_train_bwd_pallas(
            qm, km, vm, kmaskf, seed, dout, num_heads, rate
        ),
        default=fallback,
    )
    return dqm, dkm, dvm, jnp.zeros_like(kmaskf), jnp.zeros_like(seed)


merged_attention_train.defvjp(
    _merged_attention_train_fwd, _merged_attention_train_bwd
)


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
    # Mosaic's (TB*L, d) <-> (TB, L, d) sublane regroups need L aligned to
    # the 8-row sublane tile; pad with MASKED positions (exact: masked keys
    # contribute exp(min)=0, padded query rows are sliced off below)
    padL = (-L) % 8
    if padL:
        x = jnp.pad(x, ((0, 0), (0, padL), (0, 0)))
        maskf = jnp.pad(maskf, ((0, 0), (0, padL)))
        kbias = jnp.pad(kbias, ((0, 0), (0, padL)))
        has_mask = True
        L = L + padL
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
    if pad:
        out = out[:B]
    return out[:, : L - padL] if padL else out


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
    # L alignment: same masked-position padding as attention_block_pallas
    # (LayerNorm/FFN are per-position, so padded rows never leak)
    padL = (-L) % 8
    if padL:
        x = jnp.pad(x, ((0, 0), (0, padL), (0, 0)))
        maskf = jnp.pad(maskf, ((0, 0), (0, padL)))
        has_mask = True
        L = L + padL
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
    if pad:
        out = out[:B]
    return out[:, : L - padL] if padL else out


# ---------------------------------------------------------------------------
# Differentiable wrappers for the inference-fused block/layer: forward is
# the Pallas kernel (on TPU), backward falls back to jax.vjp of the
# numerically-matching XLA reference (a recompute — like jax.checkpoint,
# but with the fused forward). This keeps the fused paths valid under
# jax.grad: the train step runs the hypernet deterministically by default
# (engine.py `deterministic=not run_backbone_in_training_mode`), so the
# deterministic gate alone does NOT imply "no gradients". Residuals are
# the layer INPUTS only — the score plane and FFN activations are never
# saved, which also removes their HBM residency from the train step.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def attention_block_fused(x, maskf, kbias, wq, bq, wk, bk, wv, bv, wo, bo,
                          num_heads, has_mask, has_bias):
    out, _ = _attention_block_fused_fwd(
        x, maskf, kbias, wq, bq, wk, bk, wv, bv, wo, bo,
        num_heads, has_mask, has_bias,
    )
    return out


def _block_args(maskf, kbias, has_mask, has_bias):
    mask = (maskf > 0) if has_mask else None
    kb = kbias if has_bias else None
    return mask, kb


def _attention_block_fused_fwd(x, maskf, kbias, wq, bq, wk, bk, wv, bv, wo,
                               bo, num_heads, has_mask, has_bias):
    mask, kb = _block_args(maskf, kbias, has_mask, has_bias)
    out = jax.lax.platform_dependent(
        tpu=lambda: attention_block_pallas(
            x, mask, kb, wq, bq, wk, bk, wv, bv, wo, bo, num_heads=num_heads
        ),
        default=lambda: attention_block_reference(
            x, mask, kb, wq, bq, wk, bk, wv, bv, wo, bo, num_heads
        ),
    )
    return out, (x, maskf, kbias, wq, bq, wk, bk, wv, bv, wo, bo)


def _attention_block_fused_bwd(num_heads, has_mask, has_bias, res, dout):
    """Backward without an HBM score plane: recompute the q/k/v projections
    (XLA matmuls, roofline), run the Pallas core forward for the context
    (needed for the out-projection grads) and the Pallas core BACKWARD for
    dq/dk/dv — the (B, L·h, L·h) plane stays in VMEM in both kernels. The
    projection/output grads are plain XLA matmuls. The has_bias (priors)
    variant keeps the reference-vjp fallback (inference-only path)."""
    x, maskf, kbias, wq, bq, wk, bk, wv, bv, wo, bo = res
    mask, kb = _block_args(maskf, kbias, has_mask, has_bias)
    if has_bias:
        _, vjp = jax.vjp(
            lambda x_, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_:
            attention_block_reference(
                x_, mask, kb, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_,
                num_heads,
            ),
            x, wq, bq, wk, bk, wv, bv, wo, bo,
        )
        dx, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo = vjp(dout)
        return (dx, jnp.zeros_like(maskf), jnp.zeros_like(kbias),
                dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo)

    B, L, H = x.shape
    h = num_heads
    d = H // h
    q = x @ wq + bq
    k = x @ wk + bk
    v = x @ wv + bv
    qm = q.reshape(B, L * h, d)
    km = k.reshape(B, L * h, d)
    vm = v.reshape(B, L * h, d)
    kmaskf = jnp.repeat(maskf, h, axis=-1)
    seed = jnp.zeros((), jnp.int32)
    # the backward's Pallas kernels are the TRAIN-core formulation, which
    # has its own Mosaic constraints — gate on its own probe (the forward
    # only probed "block"); unprobed -> XLA fallback, never a compile crash
    core_ok = pallas_attention_available("core_vjp")
    ctx_m = jax.lax.platform_dependent(
        tpu=lambda: _core_train_fwd_pallas(
            qm, km, vm, kmaskf, seed, num_heads, 0.0
        ),
        default=lambda: _core_train_fallback(
            qm, km, vm, kmaskf, seed, num_heads, 0.0
        ),
    ) if core_ok else _core_train_fallback(
        qm, km, vm, kmaskf, seed, num_heads, 0.0
    )
    ctx = ctx_m.reshape(B, L, H)
    # out = ctx @ wo + bo
    dctx = dout @ wo.T
    dwo = ctx.reshape(-1, H).T @ dout.reshape(-1, H)
    dbo = dout.sum(axis=(0, 1))
    def _bwd_fallback():
        return jax.vjp(
            lambda q_, k_, v_: _core_train_fallback(
                q_, k_, v_, kmaskf, seed, num_heads, 0.0
            ),
            qm, km, vm,
        )[1](dctx.reshape(B, L * h, d))

    dqm, dkm, dvm = jax.lax.platform_dependent(
        tpu=lambda: _core_train_bwd_pallas(
            qm, km, vm, kmaskf, seed, dctx.reshape(B, L * h, d),
            num_heads, 0.0,
        ),
        default=_bwd_fallback,
    ) if core_ok else _bwd_fallback()
    dq = dqm.reshape(B, L, H)
    dk = dkm.reshape(B, L, H)
    dv = dvm.reshape(B, L, H)
    x2 = x.reshape(-1, H)
    dx = dq @ wq.T + dk @ wk.T + dv @ wv.T
    dwq = x2.T @ dq.reshape(-1, H)
    dwk = x2.T @ dk.reshape(-1, H)
    dwv = x2.T @ dv.reshape(-1, H)
    dbq = dq.sum(axis=(0, 1))
    dbk = dk.sum(axis=(0, 1))
    dbv = dv.sum(axis=(0, 1))
    return (dx, jnp.zeros_like(maskf), jnp.zeros_like(kbias),
            dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo)


attention_block_fused.defvjp(_attention_block_fused_fwd,
                             _attention_block_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19, 20, 21))
def encoder_layer_fused(x, maskf, wq, bq, wk, bk, wv, bv, wo, bo,
                        ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                        num_heads, eps, approximate_gelu, has_mask):
    out, _ = _encoder_layer_fused_fwd(
        x, maskf, wq, bq, wk, bk, wv, bv, wo, bo,
        ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
        num_heads, eps, approximate_gelu, has_mask,
    )
    return out


def _encoder_layer_fused_fwd(x, maskf, wq, bq, wk, bk, wv, bv, wo, bo,
                             ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                             num_heads, eps, approximate_gelu, has_mask):
    mask = (maskf > 0) if has_mask else None
    out = jax.lax.platform_dependent(
        tpu=lambda: encoder_layer_pallas(
            x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
            ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
            num_heads=num_heads, eps=eps,
            approximate_gelu=approximate_gelu,
        ),
        default=lambda: encoder_layer_reference(
            x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
            ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
            num_heads, eps, approximate_gelu,
        ),
    )
    return out, (x, maskf, wq, bq, wk, bk, wv, bv, wo, bo,
                 ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b)


def _encoder_layer_fused_bwd(num_heads, eps, approximate_gelu, has_mask,
                             res, dout):
    """Backward via recompute THROUGH the fused attention block: the
    attention part re-runs as the Pallas block forward and differentiates
    through attention_block_fused's plane-free backward; the LN/FFN parts
    (per-position, matmul/elementwise-roofline) differentiate in XLA."""
    (x, maskf, wq, bq, wk, bk, wv, bv, wo, bo,
     ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b) = res
    kbias0 = jnp.zeros(x.shape[:2], x.dtype)

    def recompute(x_, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_,
                  ln1_s_, ln1_b_, w1_, b1_, w2_, b2_, ln2_s_, ln2_b_):
        attn = attention_block_fused(
            x_, maskf, kbias0, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_,
            num_heads, has_mask, False,
        )
        y1 = layer_norm_flax_exact(attn + x_, ln1_s_, ln1_b_, eps, x_.dtype)
        hmid = _gelu(y1 @ w1_ + b1_, approximate_gelu)
        ffn = hmid @ w2_ + b2_
        return layer_norm_flax_exact(ffn + y1, ln2_s_, ln2_b_, eps, x_.dtype)

    _, vjp = jax.vjp(
        recompute, x, wq, bq, wk, bk, wv, bv, wo, bo,
        ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
    )
    grads = vjp(dout)
    return (grads[0], jnp.zeros_like(maskf)) + tuple(grads[1:])


encoder_layer_fused.defvjp(_encoder_layer_fused_fwd, _encoder_layer_fused_bwd)


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
    disabled = os.environ.get("ZETT_PALLAS_DISABLE", "")
    if feature in {f.strip() for f in disabled.split(",") if f.strip()}:
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
            elif feature == "core_vjp":
                qm = jnp.ones((8, L * h, d), jnp.bfloat16)
                kmaskf = jnp.ones((8, L * h), jnp.float32)
                seed = jnp.zeros((), jnp.int32)
                out = _core_train_fwd_pallas(qm, qm, qm, kmaskf, seed, h, 0.1)
                outs = _core_train_bwd_pallas(
                    qm, qm, qm, kmaskf, seed, qm, h, 0.1
                )
                jax.block_until_ready(outs)
            else:
                out = attention_block_pallas(
                    x, mask, None, w, b, w, b, w, b, w, b, num_heads=h
                )
            jax.block_until_ready(out)
        ok = True
    except Exception as exc:  # noqa: BLE001 — any failure means "fall back"
        ok = False
        _PROBE_RESULT[feature + "_error"] = repr(exc)
    if jax.process_count() > 1:
        # SPMD safety: the probe gates the STRUCTURE of collectively
        # executed programs, so all processes must agree — a transient
        # compile failure on one host would otherwise lower a different
        # program than its peers. AND-reduce the local outcomes. (All
        # processes reach this point: the gate code is identical; only a
        # per-host env override could diverge earlier — set such env vars
        # fleet-wide.)
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([1 if ok else 0], np.int32)
        )
        ok = bool(np.asarray(flags).min())
    _PROBE_RESULT[feature] = ok
    return _PROBE_RESULT[feature]
