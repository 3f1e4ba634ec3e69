"""Unigramify: BPE -> Unigram conversion with segmentation parity (the
BASELINE #2 conformance target)."""

import numpy as np
import pytest

from zett_tpu.tokenization import Tokenizer
from zett_tpu.tokenization.unigramify import unigramify


@pytest.fixture(scope="module")
def result(gpt2_like_json, corpus):
    reference = Tokenizer.from_json(gpt2_like_json)
    texts = [t for t in corpus if t.strip()]
    return unigramify(
        reference,
        train_texts=texts[:180],
        valid_texts=texts[180:240],
        max_n_train_pretokens=1500,
        top_n_encodings=8,
    )


def test_train_segmentation_accuracy(result):
    # the LP must reproduce nearly all training segmentations (reference
    # achieves ~99% on real corpora, scripts/unigramify.sh:28-51)
    assert result.train_accuracy > 0.97, f"train acc {result.train_accuracy}"


def test_valid_accuracy(result):
    assert result.valid_accuracy is not None
    assert result.valid_accuracy > 0.9, f"valid acc {result.valid_accuracy}"


def test_scores_stay_close(result):
    assert result.avg_logp_diff < 5.0


def test_output_is_unigram_and_encodes(result, corpus):
    from zett_tpu.tokenization.models import Unigram

    tok = result.tokenizer
    assert isinstance(tok.model, Unigram)
    enc = tok.encode("hello world", add_special_tokens=False)
    assert enc.ids
    # HF-loadable
    from tokenizers import Tokenizer as HFTokenizer

    hf = HFTokenizer.from_str(tok.to_str())
    for text in [t for t in corpus if t.strip()][:40]:
        assert tok.encode(text, add_special_tokens=False).ids == hf.encode(
            text, add_special_tokens=False
        ).ids
