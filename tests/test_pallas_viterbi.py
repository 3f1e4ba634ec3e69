"""Pallas Viterbi DP kernel vs the lax.scan DP (interpret mode on CPU; the
compiled kernel is exercised on real TPU by the bench/verify drives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zett_tpu.ops.pallas_viterbi import viterbi_dp_pallas


def _scan_dp(S, I):
    NEG = -1e30
    B, L, K = S.shape
    dp0 = jnp.full((B, L + K), NEG).at[:, 0].set(0.0)
    bk0 = jnp.zeros((B, L + K), jnp.int32)
    bi0 = jnp.full((B, L + K), -1, jnp.int32)

    def step(carry, j):
        dp, bk, bi = carry
        dj = jax.lax.dynamic_slice(dp, (0, j), (B, 1))
        cand = dj + S[:, j, :]
        window = jax.lax.dynamic_slice(dp, (0, j + 1), (B, K))
        better = cand > window
        dp = jax.lax.dynamic_update_slice(dp, jnp.where(better, cand, window), (0, j + 1))
        bkw = jax.lax.dynamic_slice(bk, (0, j + 1), (B, K))
        biw = jax.lax.dynamic_slice(bi, (0, j + 1), (B, K))
        bk = jax.lax.dynamic_update_slice(
            bk, jnp.where(better, jnp.arange(1, K + 1)[None], bkw), (0, j + 1)
        )
        bi = jax.lax.dynamic_update_slice(bi, jnp.where(better, I[:, j, :], biw), (0, j + 1))
        return (dp, bk, bi), None

    (dp, bk, bi), _ = jax.lax.scan(step, (dp0, bk0, bi0), jnp.arange(L))
    return dp, bk, bi


@pytest.mark.parametrize("B,L,K,tile", [(64, 24, 8, 32), (100, 16, 16, 64)])
def test_pallas_dp_matches_scan(B, L, K, tile):
    rng = np.random.default_rng(0)
    S = np.where(
        rng.random((B, L, K)) < 0.3, rng.normal(size=(B, L, K)) - 2, -1e30
    ).astype(np.float32)
    S[:, :, 0] = rng.normal(size=(B, L)) - 5  # single-byte spans always exist
    I = rng.integers(0, 100, size=(B, L, K)).astype(np.int32)
    dp_p, bk_p, bi_p = viterbi_dp_pallas(
        jnp.asarray(S), jnp.asarray(I), tile_b=tile, interpret=True
    )
    dp_s, bk_s, bi_s = _scan_dp(jnp.asarray(S), jnp.asarray(I))
    np.testing.assert_allclose(np.asarray(dp_p), np.asarray(dp_s), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(bk_p), np.asarray(bk_s))
    np.testing.assert_array_equal(np.asarray(bi_p), np.asarray(bi_s))
