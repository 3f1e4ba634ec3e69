"""Pallas TPU kernel for the Viterbi DP inner loop.

The XLA path (device_viterbi.viterbi_device) runs the DP as a lax.scan of L
small dynamic-update-slices; this kernel keeps the dp rows and backpointers
resident in VMEM and runs the whole sequential relax in one launch, tiled
over the pretoken batch.

TPU layout note: Mosaic only allows dynamic-start slices on non-lane
dimensions, so the position axis lives on the SUBLANE dim — arrays are
(L, K, B) / (L+K, B) with the batch on lanes (tile multiple of 128).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _viterbi_dp_kernel(S_ref, I_ref, dp_ref, bk_ref, bi_ref):
    """One batch tile. S/I: (L, K, TB) span scores / piece ids (position on
    sublanes, batch on lanes). Outputs dp/bk/bi: (L+K+8, TB).

    Mosaic requires dynamic window starts on the sublane dim to be multiples
    of 8, so each step updates the ALIGNED window [start, start+K+8) with the
    K candidates scattered to their offset via a one-hot matmul."""
    L, K, TB = S_ref.shape
    W = K + 8
    row = jax.lax.broadcasted_iota(jnp.int32, (L + K + 8, TB), 0)
    dp_ref[:] = jnp.where(row == 0, 0.0, NEG)
    bk_ref[:] = jnp.zeros((L + K + 8, TB), dtype=jnp.int32)
    bi_ref[:] = jnp.full((L + K + 8, TB), -1, dtype=jnp.int32)

    klens = jax.lax.broadcasted_iota(jnp.int32, (K, TB), 0) + 1
    neg_pad = jnp.full((8, TB), NEG, dtype=jnp.float32)
    int_pad = jnp.full((8, TB), -1, dtype=jnp.int32)

    def body(j, _):
        dj = dp_ref[j, :]  # (TB,)  — single dynamic rows are allowed
        cand = dj[None, :] + S_ref[j]  # (K, TB)
        start = ((j + 1) // 8) * 8  # aligned window start
        off = (j + 1) - start  # 0..7
        # scatter candidates to their in-window offset by rolling a padded
        # block: the 8 NEG padding rows wrap to the top for rows < off
        cand_w = pltpu.roll(jnp.concatenate([cand, neg_pad], axis=0), off, axis=0)
        window = dp_ref[pl.ds(start, W), :]
        better = cand_w > window
        dp_ref[pl.ds(start, W), :] = jnp.where(better, cand_w, window)
        klens_w = pltpu.roll(jnp.concatenate([klens, int_pad], axis=0), off, axis=0)
        bk_ref[pl.ds(start, W), :] = jnp.where(
            better, klens_w, bk_ref[pl.ds(start, W), :]
        )
        ids_w = pltpu.roll(jnp.concatenate([I_ref[j], int_pad], axis=0), off, axis=0)
        bi_ref[pl.ds(start, W), :] = jnp.where(
            better, ids_w, bi_ref[pl.ds(start, W), :]
        )
        return 0

    jax.lax.fori_loop(0, L, body, 0)


@partial(jax.jit, static_argnames=("tile_b", "interpret"))
def viterbi_dp_pallas(S, I, tile_b: int = 512, interpret: bool = False):
    """S, I: (B, L, K) span scores / piece ids. Returns (dp, bk, bi) of shape
    (B, L+K) — same contract as the lax.scan DP."""
    B, L, K = S.shape
    n_pad = (-B) % tile_b
    if n_pad:
        S = jnp.pad(S, ((0, n_pad), (0, 0), (0, 0)), constant_values=NEG)
        I = jnp.pad(I, ((0, n_pad), (0, 0), (0, 0)), constant_values=-1)
    Bp = B + n_pad
    St = jnp.transpose(S, (1, 2, 0))  # (L, K, Bp)
    It = jnp.transpose(I, (1, 2, 0))
    grid = (Bp // tile_b,)
    R = L + K + 8
    out_shape = [
        jax.ShapeDtypeStruct((R, Bp), jnp.float32),
        jax.ShapeDtypeStruct((R, Bp), jnp.int32),
        jax.ShapeDtypeStruct((R, Bp), jnp.int32),
    ]
    dp, bk, bi = pl.pallas_call(
        _viterbi_dp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, K, tile_b), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, K, tile_b), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(St, It)
    return dp.T[:B, : L + K], bk.T[:B, : L + K], bi.T[:B, : L + K]
