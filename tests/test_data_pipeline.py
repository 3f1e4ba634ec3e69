"""End-to-end tests for the host data pipeline: datasets -> collator -> batch."""

import numpy as np
import pytest

from zett_tpu.data import Collator, DataConfig, MLMCollator, TrainDataset, ValidDataset
from zett_tpu.tokenization import Tokenizer
from zett_tpu.tokenization.convert import convert_to_byte_level


@pytest.fixture(scope="module")
def reference_tok():
    from fixtures import _cached, _build_gpt2_like

    tok = Tokenizer.from_json(_cached("gpt2_like", _build_gpt2_like))
    conv, _ = convert_to_byte_level(tok)
    return conv


@pytest.fixture(scope="module")
def hn_tok(reference_tok):
    return reference_tok.copy()


def _small_cfg(**kw):
    defaults = dict(
        block_size=32,
        do_tokenizer_sampling=True,
        hn_surface_maxlen=7,
        n_token_subsample=256,
        pad_to_multiple_of=64,
        tokenizer_sample_mean=2000,
        tokenizer_sample_std=0,
        tokenizer_sample_min=512,
        tokenizer_sample_max=2048,
        tokenizer_noise_mean=1e-5,
        tokenizer_noise_std=2.0,
        langs=["en"],
    )
    defaults.update(kw)
    return DataConfig(**defaults)


class TestSampledBatch:
    @pytest.fixture(scope="class")
    def collator(self, reference_tok, hn_tok, corpus):
        return Collator(
            reference=reference_tok,
            hn_tokenizer=hn_tok,
            data_config=_small_cfg(),
            batch_size=8,
            initial_texts={"en": [t for t in corpus if t.strip()][:32]},
            seed=0,
        )

    def test_batch_structure(self, collator, corpus):
        batch = collator({"texts": [t for t in corpus if len(t) > 20][:8], "lang_code": "en"})
        cfg = collator.cfg
        assert batch["input_ids"].shape == (8, cfg.block_size)
        assert batch["target_surface_forms"].shape == (cfg.n_token_subsample, cfg.hn_surface_maxlen)
        assert batch["target_priors"].shape == (cfg.n_token_subsample,)
        assert batch["mask"].shape == (cfg.n_token_subsample,)
        assert batch["ids_to_embed"].shape == (cfg.n_token_subsample,)
        assert (batch["input_ids"] < cfg.n_token_subsample).all()
        assert batch["labels"].shape == (8, cfg.block_size)

    def test_remap_round_trip(self, collator, corpus):
        """inv_ids_to_embed remap: ids_to_embed[new_id] recovers the original
        sampled-tokenizer id for every position."""
        texts = [t for t in corpus if len(t) > 20][8:16]
        batch = collator({"texts": texts, "lang_code": "en"})
        remapped = batch["ids_to_embed"][batch["input_ids"]]
        # re-encode positions: every remapped id must index a surface form
        # consistent with the token at that position — weaker invariant:
        # the remap is a bijection on used ids
        used = np.unique(batch["input_ids"])
        assert len(np.unique(batch["ids_to_embed"][used])) == len(used)
        assert remapped.max() < len(batch["ids_to_embed"]) + collator.cfg.tokenizer_sample_max

    def test_special_tokens_preserved_at_indices(self, collator, corpus):
        batch = collator({"texts": [t for t in corpus if len(t) > 20][:8], "lang_code": "en"})
        ref = collator.reference
        for sid, spos in zip(
            sorted(ref.all_special_ids), np.sort(batch["special_indices"])
        ):
            # special tokens occupy their own index inside ids_to_embed
            assert batch["ids_to_embed"][spos] in ref.all_special_ids or spos == sid

    def test_metrics_present(self, collator, corpus):
        batch = collator({"texts": [t for t in corpus if len(t) > 20][:8], "lang_code": "en"})
        assert 0 < batch["metrics"]["avg_byte_length"] < 32
        assert 0 <= batch["metrics"]["unk_ratio"] <= 1

    def test_validation_collator_does_not_grow_cache(self, reference_tok, hn_tok, corpus):
        texts = [t for t in corpus if t.strip()][:16]
        coll = Collator(
            reference=reference_tok,
            hn_tokenizer=hn_tok,
            data_config=_small_cfg(),
            batch_size=8,
            initial_texts={"en": texts},
            is_validation=True,
            seed=1,
        )
        sampler = coll.samplers["en"][0]
        n = len(sampler.seed_cache)
        coll({"texts": texts[:8], "lang_code": "en"})
        assert len(sampler.seed_cache) == n


class TestFixedTokenizerBatch:
    def test_fixed_path(self, reference_tok, hn_tok, corpus):
        cfg = _small_cfg(do_tokenizer_sampling=False, n_token_subsample=None)
        coll = Collator(
            reference=reference_tok,
            hn_tokenizer=hn_tok,
            data_config=cfg,
            batch_size=4,
            fixed_tokenizer=reference_tok.copy(),
            seed=0,
        )
        batch = coll({"texts": [t for t in corpus if len(t) > 20][:4], "lang_code": "en"})
        assert batch["input_ids"].shape == (4, cfg.block_size)
        n_vocab = batch["target_surface_forms"].shape[0]
        assert n_vocab % cfg.pad_to_multiple_of == 0
        assert batch["mask"].sum() <= n_vocab

    def test_identity_step(self, reference_tok, hn_tok, corpus):
        cfg = _small_cfg(do_tokenizer_sampling=False, n_token_subsample=64, pad_to_multiple_of=64)
        coll = Collator(
            reference=reference_tok,
            hn_tokenizer=hn_tok,
            data_config=cfg,
            batch_size=4,
            fixed_tokenizer=reference_tok.copy(),
            lang_code="en",
            seed=0,
        )
        batch = coll(None, for_identity_step=True)
        assert batch["target_surface_forms"].shape == (64, cfg.hn_surface_maxlen)
        assert (batch["ids_to_embed"] < coll.original_length).all()
        assert len(np.unique(batch["ids_to_embed"])) == 64


class TestDatasets:
    def test_train_dataset_packing(self):
        texts = {"en": [f"sentence number {i} with some words" for i in range(50)]}
        ds = TrainDataset(
            langs=["en"], batch_size=4, block_size=8, texts_by_lang=texts, eos_token="<eos>"
        )
        batch = next(iter(ds))
        assert len(batch["texts"]) == 4
        assert all(len(t) >= 8 * 16 for t in batch["texts"])  # packed to min length
        assert "<eos>" in batch["texts"][0]

    def test_valid_dataset_deterministic(self):
        texts = {"en": [f"text {i}" for i in range(20)], "de": [f"de {i}" for i in range(10)]}
        ds = ValidDataset(langs=["en", "de"], batch_size=4, texts_by_lang=texts)
        assert len(ds) == 5 + 2
        assert ds[0]["lang_code"] == "en"
        assert ds[5]["lang_code"] == "de"
        assert ds[0]["texts"] == ds[0]["texts"]

    def test_language_probs(self):
        from zett_tpu.data import language_probs_from_sizes

        p = language_probs_from_sizes([100, 1], alpha=0.3)
        assert p.sum() == pytest.approx(1.0)
        assert p[0] > p[1]
        # alpha < 1 flattens the distribution
        assert p[1] > 1 / 101


class TestMLM:
    def test_mlm_masking(self, reference_tok):
        tok = reference_tok.copy()
        tok.add_special_tokens(["<mask>"])
        coll = MLMCollator(mlm_probability=0.5, seed=0)
        ids = np.arange(200, dtype=np.int64).reshape(2, 100) % 150
        out = coll(tok, ids)
        masked = out["labels"] != -100
        assert 0.2 < masked.mean() < 0.8
        # unmasked positions unchanged
        assert (out["input_ids"][~masked] == ids[~masked]).all()
        # labels at masked positions hold the original ids
        assert (out["labels"][masked] == ids[masked]).all()


class TestPerLanguageBatches:
    def _texts(self):
        return {
            "en": [f"english sentence number {i} with several words" for i in range(40)],
            "de": [f"deutscher satz nummer {i} mit einigen worten" for i in range(40)],
        }

    def test_single_language_batches(self):
        ds = TrainDataset(
            langs=["en", "de"], batch_size=4, block_size=4,
            texts_by_lang=self._texts(), eos_token="<eos>", seed=0,
        )
        seen = set()
        it = iter(ds)
        for _ in range(20):
            batch = next(it)
            assert batch["lang_code"] in ("en", "de")
            seen.add(batch["lang_code"])
            # every text in the batch comes from that batch's language
            marker = "english" if batch["lang_code"] == "en" else "deutscher"
            assert all(marker in t for t in batch["texts"])
        assert seen == {"en", "de"}

    def test_language_probs_respected(self):
        ds = TrainDataset(
            langs=["en", "de"], language_probs=np.array([1.0, 0.0]),
            batch_size=2, block_size=4, texts_by_lang=self._texts(), seed=0,
        )
        it = iter(ds)
        assert all(next(it)["lang_code"] == "en" for _ in range(10))

    def test_mix_languages(self):
        ds = TrainDataset(
            langs=["en", "de"], batch_size=8, block_size=4,
            texts_by_lang=self._texts(), mix_languages=True, seed=0,
        )
        batch = next(iter(ds))
        assert batch["lang_code"] == "all"
        joined = " ".join(batch["texts"])
        assert "english" in joined and "deutscher" in joined

    def test_worker_epochs_disjoint_and_complete(self):
        from zett_tpu.data.datasets import LanguageStream

        texts = [f"t{i}" for i in range(10)]
        covered = []
        for w in range(2):
            s = LanguageStream(
                texts, min_chars=1, do_packing=False, seed=7,
                worker_idx=w, num_workers=2,
            )
            covered.append({next(s) for _ in range(5)})
        assert covered[0].isdisjoint(covered[1])
        assert covered[0] | covered[1] == set(texts)

    def test_load_language_list(self, tmp_path):
        from zett_tpu.data.datasets import load_language_list

        plain = tmp_path / "l.txt"
        plain.write_text("en\nde\n")
        assert load_language_list(str(plain)) == (["en", "de"], None)
        weighted = tmp_path / "w.txt"
        weighted.write_text("en,3\nde,1\n")
        langs, probs = load_language_list(str(weighted))
        assert langs == ["en", "de"]
        assert probs == pytest.approx([0.75, 0.25])

    def test_language_sizes_from_metadata(self, tmp_path):
        from zett_tpu.data.datasets import language_sizes_from_metadata

        csv = tmp_path / "meta.csv"
        csv.write_text("lang_code,n_pages\nen,1000\nde,10\n")
        sizes = language_sizes_from_metadata(["de", "en"], str(csv))
        assert list(sizes) == [10.0, 1000.0]
        with pytest.raises(KeyError):
            language_sizes_from_metadata(["xx"], str(csv))
