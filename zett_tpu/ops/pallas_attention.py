"""Fused attention block for the hypernet's tiny-sequence regime (Pallas).

Profiling the 32k-vocab transfer forward (experiments/profiles/
hypernet_r3.md) shows ~33 ms/run of HBM relayout copies around the per-head
attention einsums: XLA materializes (B, L, NH, HD) head layouts in HBM
between the projection matmuls and the batched tiny (L<=16) attention
matmuls. This kernel computes the whole attention block — q/k/v
projections, per-head scores, masked softmax, context, output projection —
inside one VMEM-resident tile, so the head reshapes never touch HBM.

Status: correctness-verified against the pure-JAX reference in interpret
mode (tests/test_pallas_attention.py). On-chip Mosaic compilation through
the remote axon tunnel currently fails server-side: the first formulation
hit `tpu.matmul op Not implemented: Up to 1 batch dim supported` (fixed by
merging (tile, heads) into one batch dim), after which the tunnel's
remote_compile helper itself crashes (HTTP 500, no diagnostics). The XLA
attention therefore remains the production path; this kernel is the
ready-to-measure candidate for locally-attached hardware, where the
~33 ms/run of head-relayout HBM copies it eliminates are the largest
remaining line in the forward profile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def attention_block_reference(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads):
    """Pure-JAX reference: exactly models/hypernet.py's Attention in bf16
    (scores in compute dtype, softmax in f32)."""
    B, L, H = x.shape
    HD = H // num_heads
    q = (x @ wq + bq).reshape(B, L, num_heads, HD)
    k = (x @ wk + bk).reshape(B, L, num_heads, HD)
    v = (x @ wv + bv).reshape(B, L, num_heads, HD)
    bias = jnp.where(
        mask[:, None, None, :],
        jnp.asarray(0.0, x.dtype),
        jnp.asarray(jnp.finfo(x.dtype).min, x.dtype),
    )
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    scores = scores / jnp.sqrt(HD).astype(scores.dtype) + bias
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, L, H)
    return out @ wo + bo


def _kernel(x_ref, maskb_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wo_ref, bo_ref, out_ref, *, num_heads: int, L: int):
    TB = x_ref.shape[0]
    H = x_ref.shape[2]
    HD = H // num_heads
    dtype = x_ref.dtype
    xf = x_ref[:].reshape(TB * L, H)
    # projections on the MXU; accumulate f32, keep activations in bf16
    q = (jnp.dot(xf, wq_ref[:], preferred_element_type=jnp.float32)
         + bq_ref[:]).astype(dtype)
    k = (jnp.dot(xf, wk_ref[:], preferred_element_type=jnp.float32)
         + bk_ref[:]).astype(dtype)
    v = (jnp.dot(xf, wv_ref[:], preferred_element_type=jnp.float32)
         + bv_ref[:]).astype(dtype)
    # Mosaic's tpu.matmul supports at most ONE batch dim: merge (TB, NH)
    q3 = q.reshape(TB, L, num_heads, HD).transpose(0, 2, 1, 3).reshape(
        TB * num_heads, L, HD)
    k3 = k.reshape(TB, L, num_heads, HD).transpose(0, 2, 1, 3).reshape(
        TB * num_heads, L, HD)
    v3 = v.reshape(TB, L, num_heads, HD).transpose(0, 2, 1, 3).reshape(
        TB * num_heads, L, HD)
    scores = jax.lax.dot_general(
        q3, k3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TB*NH, L, L)
    scores = scores * (1.0 / np.sqrt(HD))
    maskb = maskb_ref[:].astype(jnp.float32)  # (TB, L)
    scores = scores.reshape(TB, num_heads, L, L) + maskb[:, None, None, :]
    scores = scores.reshape(TB * num_heads, L, L)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
    ctx = jax.lax.dot_general(
        w, v3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)  # (TB*NH, L, HD)
    ctxf = ctx.reshape(TB, num_heads, L, HD).transpose(0, 2, 1, 3).reshape(
        TB * L, H)
    out = (jnp.dot(ctxf, wo_ref[:], preferred_element_type=jnp.float32)
           + bo_ref[:]).astype(dtype)
    out_ref[:] = out.reshape(TB, L, H)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "tile_b", "interpret"),
)
def attention_block_pallas(x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                           num_heads: int, tile_b: int = 128,
                           interpret: bool = False):
    """x (B, L, H) bf16, mask (B, L) bool; B must divide by tile_b."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, H = x.shape
    assert B % tile_b == 0, (B, tile_b)
    maskb = jnp.where(
        mask, jnp.float32(0.0), jnp.float32(np.finfo(np.float32).min)
    )
    grid = (B // tile_b,)
    row_spec = pl.BlockSpec((tile_b, L, H), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((tile_b, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((H, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((H,), lambda i: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, L=L),
        out_shape=jax.ShapeDtypeStruct((B, L, H), x.dtype),
        grid=grid,
        in_specs=[row_spec, mask_spec, w_spec, b_spec, w_spec, b_spec,
                  w_spec, b_spec, w_spec, b_spec],
        out_specs=row_spec,
        interpret=interpret,
    )(x, maskb, wq, bq, wk, bk, wv, bv, wo, bo)
