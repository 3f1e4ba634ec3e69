"""Baseline transfer methods: lexical/FVT, FOCUS, passthrough, apply_to_ft."""

import numpy as np
import pytest

from zett_tpu.tokenization import Tokenizer
from zett_tpu.tokenization.convert import convert_to_byte_level
from zett_tpu.transfer.baselines import (
    apply_to_ft,
    char_ngram_embeddings,
    focus_transfer,
    lexical_transfer,
    passthrough_transfer,
)


@pytest.fixture(scope="module")
def toks(gpt2_like_json, xlmr_like_json):
    source, _ = convert_to_byte_level(Tokenizer.from_json(gpt2_like_json))
    target, _ = convert_to_byte_level(
        Tokenizer.from_json(xlmr_like_json), match_special_tokens_to=source
    )
    return source, target


def test_lexical_overlap_copy(toks):
    source, target = toks
    rng = np.random.default_rng(0)
    src_emb = rng.normal(size=(len(source), 8)).astype(np.float32)
    emb, overlap = lexical_transfer(src_emb, source, target, fvt_mode="no")
    assert emb.shape == (len(target), 8)
    assert len(overlap) > 0
    # overlapping tokens copied exactly
    for i in overlap[:50]:
        token = target.id_to_token(i)
        sid = source.token_to_id(token)
        np.testing.assert_array_equal(emb[i], src_emb[sid])


def test_fvt_mean_of_subtokens(toks):
    source, target = toks
    rng = np.random.default_rng(0)
    src_emb = rng.normal(size=(len(source), 8)).astype(np.float32)
    _, overlap_no = lexical_transfer(src_emb, source, target, fvt_mode="no")
    emb_fvt, overlap_fvt = lexical_transfer(src_emb, source, target, fvt_mode="bfvt")
    assert len(overlap_fvt) > len(overlap_no), "FVT did not cover extra tokens"


def test_focus_weighted_combination(toks):
    source, target = toks
    rng = np.random.default_rng(0)
    src_emb = rng.normal(size=(len(source), 8)).astype(np.float32)
    emb, overlap = focus_transfer(src_emb, source, target)
    assert emb.shape == (len(target), 8)
    assert np.isfinite(emb).all()
    # non-overlap embeddings live inside the convex hull scale-wise
    non_overlap = sorted(set(range(len(target))) - set(overlap))
    if non_overlap:
        norms = np.linalg.norm(emb[non_overlap], axis=1)
        assert norms.max() <= np.linalg.norm(src_emb, axis=1).max() * 1.5


def test_char_ngram_embeddings_similarity():
    emb = char_ngram_embeddings(["hello", "hella", "xyzzy"])
    sim_close = emb[0] @ emb[1]
    sim_far = emb[0] @ emb[2]
    assert sim_close > sim_far


def test_passthrough_slice():
    params = {
        "input_embeddings": {"embedding": np.arange(40).reshape(10, 4)},
        "output_embeddings": {"embedding": np.arange(40).reshape(10, 4) * 2},
    }
    emb_in, emb_out = passthrough_transfer(params, 6)
    assert emb_in.shape == (6, 4)
    assert emb_out.shape == (6, 4)


def test_apply_to_ft_task_vector():
    base = {"transformer": {"wte": {"embedding": np.zeros((4, 2))},
                            "h_0": {"c_fc": {"kernel": np.ones((2, 2))}}}}
    ft = {"transformer": {"wte": {"embedding": np.zeros((4, 2))},
                          "h_0": {"c_fc": {"kernel": np.ones((2, 2)) * 3}}}}
    swapped = {"transformer": {"wte": {"embedding": np.full((5, 2), 9.0)},
                               "h_0": {"c_fc": {"kernel": np.ones((2, 2)) * 2}}}}
    out = apply_to_ft(base, ft, swapped, "gpt2", lam=0.5)
    # embeddings installed from swapped model
    np.testing.assert_array_equal(out["transformer"]["wte"]["embedding"],
                                  swapped["transformer"]["wte"]["embedding"])
    # non-embedding: ft + 0.5*(swapped-base) = 3 + 0.5*(2-1) = 3.5
    np.testing.assert_allclose(out["transformer"]["h_0"]["c_fc"]["kernel"], 3.5)


def test_ofa_transfer_char_ngram_fallback(toks):
    from zett_tpu.transfer.baselines import ofa_transfer

    source, target = toks
    rng = np.random.default_rng(0)
    src_emb = rng.normal(size=(len(source), 8)).astype(np.float32)
    emb, overlap = ofa_transfer(src_emb, source, target, top_k=5)
    assert emb.shape == (len(target), 8)
    assert np.isfinite(emb).all()
    assert len(overlap) > 0
    for i in overlap[:50]:
        sid = source.token_to_id(target.id_to_token(i))
        np.testing.assert_array_equal(emb[i], src_emb[sid])


def test_ofa_transfer_with_word_embeddings_and_factorize(toks):
    from zett_tpu.transfer.baselines import ofa_subword_embeddings, ofa_transfer

    source, target = toks
    rng = np.random.default_rng(1)
    src_emb = rng.normal(size=(len(source), 16)).astype(np.float32)
    words = ["the", "of", "and", "to", "in", "was", "hello", "world", "test", "der", "die", "das"]
    word_emb = {w: rng.normal(size=12).astype(np.float32) for w in words}

    reps, has = ofa_subword_embeddings(source, word_emb)
    assert reps.shape == (len(source), 12)
    assert has.any(), "no subword got a representation"
    norms = np.linalg.norm(reps[has], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    emb, overlap = ofa_transfer(
        src_emb, source, target, word_embeddings=word_emb, factorize_dim=8, top_k=3
    )
    assert emb.shape == (len(target), 16)
    assert np.isfinite(emb).all()
    # overlap rows exact even under factorization
    for i in overlap[:20]:
        sid = source.token_to_id(target.id_to_token(i))
        np.testing.assert_array_equal(emb[i], src_emb[sid])


def test_ofa_identical_vocab_copies_everything(toks):
    from zett_tpu.transfer.baselines import ofa_transfer

    source, _ = toks
    rng = np.random.default_rng(2)
    src_emb = rng.normal(size=(len(source), 8)).astype(np.float32)
    emb, overlap = ofa_transfer(src_emb, source, source)
    assert len(overlap) == len(source)
    np.testing.assert_array_equal(emb, src_emb)
