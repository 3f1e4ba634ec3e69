"""Data layer: per-language infinite packed streams + deterministic validation.

Capability parity with the reference data layer (zett/dataset.py plus the
per-language dataloader pool built in train.py:387-465): training batches are
SINGLE-LANGUAGE — each batch picks one language by probability and draws every
text from that language's stream — so the sampled tokenizer is
language-specific and `lang_index` is meaningful for language embeddings and
adapters, and train metrics can disaggregate per language. The reference
realizes this with one dataset+dataloader+collator per language and a per-step
choice among the dataloaders (train.py:1430-1437); here one dataset owns all
language streams and makes the per-batch choice itself, which keeps a single
host DataLoader.

`mix_languages=True` instead interleaves languages WITHIN each batch and tags
the batch "all" (reference mixed mode, train.py:387-403).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..constants import MAX_CHARS_PER_TOKEN

try:
    from torch.utils.data import Dataset as TorchDataset
    from torch.utils.data import IterableDataset as TorchIterableDataset
    from torch.utils.data import get_worker_info
except Exception:  # pragma: no cover - torch always present in this image
    TorchDataset = object
    TorchIterableDataset = object

    def get_worker_info():
        return None


# ----------------------------------------------------------------- sources
def open_text_source(directory: str, lang: str):
    """Indexable of texts for `lang` under `directory`: an HF dataset dir
    (<directory>/<lang>/), a parquet file (<lang>.parquet — the layout
    data/prepare.py writes) or a plain <lang>.txt (one text per line)."""
    path_dir = os.path.join(directory, lang)
    path_parquet = os.path.join(directory, f"{lang}.parquet")
    path_txt = os.path.join(directory, f"{lang}.txt")
    if os.path.isdir(path_dir):
        from datasets import DatasetDict, load_from_disk

        dset = load_from_disk(path_dir)
        if isinstance(dset, DatasetDict):
            dset = dset["train"]
        return _HFTextView(dset)
    if os.path.exists(path_parquet):
        from datasets import load_dataset

        return _HFTextView(
            load_dataset("parquet", data_files=path_parquet, split="train")
        )
    if os.path.exists(path_txt):
        with open(path_txt) as f:
            return [line.rstrip("\n") for line in f if line.strip()]
    raise ValueError(f"No training data for language {lang} in {directory}")


class _HFTextView:
    """Adapter exposing an HF dataset's `text` column as a plain sequence."""

    def __init__(self, dset):
        self._dset = dset

    def __len__(self):
        return len(self._dset)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return self._dset[idx]["text"]
        return self._dset[int(idx)]["text"]


def _resolve_sources(
    langs: Sequence[str],
    train_directory: Optional[str],
    texts_by_lang: Optional[Dict[str, List[str]]],
) -> Dict[str, object]:
    sources: Dict[str, object] = {}
    for lang in langs:
        if texts_by_lang is not None and lang in texts_by_lang:
            sources[lang] = texts_by_lang[lang]
        else:
            assert train_directory is not None, f"no data source for {lang}"
            sources[lang] = open_text_source(train_directory, lang)
    return sources


# ------------------------------------------------------------------ streams
class LanguageStream:
    """Infinite packed-text stream over ONE language's corpus.

    Epochs are independent deterministic permutations (epoch e of language
    with seed s uses rng(s, e)); a worker consumes its strided slice
    [worker_idx::num_workers] of each epoch so workers are disjoint yet every
    worker count walks the same global order. Texts are greedily packed with
    the eos separator until the packed string reaches `min_chars`
    (block_size * MAX_CHARS_PER_TOKEN at the call site).
    """

    def __init__(
        self,
        source,
        *,
        min_chars: int,
        eos_token: Optional[str] = None,
        do_packing: bool = True,
        seed: int = 0,
        worker_idx: int = 0,
        num_workers: int = 1,
    ):
        assert len(source) > 0, "empty corpus"
        self.source = source
        self.min_chars = min_chars
        self.eos = eos_token or ""
        self.do_packing = do_packing
        self.seed = seed
        self.worker_idx = worker_idx
        self.num_workers = num_workers
        self._epoch = -1
        self._order = np.empty(0, dtype=np.int64)
        self._cursor = 0

    def _advance_epoch(self):
        self._epoch += 1
        rng = np.random.default_rng([self.seed, self._epoch])
        self._order = rng.permutation(len(self.source))[
            self.worker_idx :: self.num_workers
        ]
        self._cursor = 0

    def _next_raw(self) -> str:
        while True:
            if self._cursor >= len(self._order):
                self._advance_epoch()
            text = self.source[int(self._order[self._cursor])]
            self._cursor += 1
            text = text.strip()
            if text:
                return text

    def __iter__(self) -> Iterator[str]:
        return self

    def __next__(self) -> str:
        parts = [self._next_raw()]
        if self.do_packing:
            total = len(parts[0])
            while total < self.min_chars:
                nxt = self._next_raw()
                total += len(self.eos) + len(nxt)
                parts.append(nxt)
        return self.eos.join(parts)


# ----------------------------------------------------------------- datasets
class TrainDataset(TorchIterableDataset):
    """Infinite stream of text batches.

    Default mode emits single-language batches: one language is drawn per
    batch from `language_probs` and the whole batch comes from that
    language's stream (`lang_code` = that language). With
    `mix_languages=True` the language is drawn per TEXT and the batch is
    tagged `lang_code="all"`.
    """

    def __init__(
        self,
        langs: Sequence[str],
        language_probs: Optional[np.ndarray] = None,
        batch_size: int = 128,
        block_size: int = 128,
        train_directory: Optional[str] = None,
        texts_by_lang: Optional[Dict[str, List[str]]] = None,
        do_sequence_packing: bool = True,
        eos_token: Optional[str] = None,
        mix_languages: bool = False,
        seed: int = 0,
    ):
        self.langs = [l for l in langs if l != "all"]
        if language_probs is None:
            probs = np.ones(len(self.langs), dtype=np.float64)
        else:
            probs = np.asarray(language_probs, dtype=np.float64)
            assert len(probs) == len(self.langs)
        self.language_probs = probs / probs.sum()
        self.batch_size = batch_size
        self.min_chars = block_size * MAX_CHARS_PER_TOKEN
        self.do_sequence_packing = do_sequence_packing
        self.eos_token = eos_token
        self.mix_languages = mix_languages
        self.seed = seed
        self.dataset = _resolve_sources(self.langs, train_directory, texts_by_lang)

    # helpers used by the CLI to warm the per-language sampler pools
    def get_texts_in_each_language(self, n: int) -> Dict[str, List[str]]:
        return {lang: list(self.dataset[lang][:n]) for lang in self.langs}

    def get_texts(self, n: int) -> List[str]:
        texts: List[str] = []
        for batch in self:
            texts.extend(batch["texts"])
            if len(texts) >= n:
                break
        return texts[:n]

    def _make_streams(self, worker_idx: int, num_workers: int):
        return {
            lang: LanguageStream(
                self.dataset[lang],
                min_chars=self.min_chars,
                eos_token=self.eos_token,
                do_packing=self.do_sequence_packing,
                seed=self.seed + i,
                worker_idx=worker_idx,
                num_workers=num_workers,
            )
            for i, lang in enumerate(self.langs)
        }

    def __iter__(self):
        info = get_worker_info()
        num_workers = info.num_workers if info is not None else 1
        worker_idx = info.id if info is not None else 0
        streams = self._make_streams(worker_idx, num_workers)
        rng = np.random.default_rng([self.seed, 977, worker_idx])

        while True:
            if self.mix_languages:
                choice = rng.choice(
                    len(self.langs), size=self.batch_size, p=self.language_probs
                )
                yield {
                    "texts": [next(streams[self.langs[c]]) for c in choice],
                    "lang_code": "all",
                }
            else:
                lang = self.langs[
                    int(rng.choice(len(self.langs), p=self.language_probs))
                ]
                yield {
                    "texts": [next(streams[lang]) for _ in range(self.batch_size)],
                    "lang_code": lang,
                }


class ValidDataset(TorchDataset):
    """Deterministic map-style dataset of per-language text batches: the
    index space is a precomputed (language, offset) table covering each
    language's full batches in order."""

    def __init__(
        self,
        langs: Sequence[str],
        batch_size: int,
        n_subsample: Optional[int] = None,
        valid_directory: Optional[str] = None,
        texts_by_lang: Optional[Dict[str, List[str]]] = None,
    ):
        self.langs = [l for l in langs if l != "all"]
        self.batch_size = batch_size
        self.dataset: Dict[str, List[str]] = {}
        self._index: List[Tuple[str, int]] = []
        for lang in self.langs:
            if texts_by_lang is not None and lang in texts_by_lang:
                texts = list(texts_by_lang[lang])
            else:
                assert valid_directory is not None
                src = open_text_source(valid_directory, lang)
                texts = list(src[: n_subsample if n_subsample else len(src)])
            if n_subsample is not None:
                texts = texts[:n_subsample]
            self.dataset[lang] = texts
            n_batches = len(texts) // batch_size
            self._index.extend((lang, b * batch_size) for b in range(n_batches))
            if n_batches == 0 and texts:
                # fewer texts than one batch: keep ONE partial batch rather
                # than silently contributing nothing — an empty eval stream
                # produced {} from eval_loop with no error (the in-training
                # eval then no-ops invisibly)
                self._index.append((lang, 0))

    def __len__(self):
        return len(self._index)

    def __getitem__(self, idx):
        lang, start = self._index[idx]
        texts = self.dataset[lang][start : start + self.batch_size]
        if len(texts) < self.batch_size:
            # pad the partial batch to the FULL batch size with empty
            # texts: empty rows encode to all-pad (attention_mask 0,
            # byte_lengths 0) and contribute nothing to any loss/bpb
            # denominator, while the batch keeps the uniform shape the
            # sharded eval step requires (a ragged batch would break the
            # mesh data-axis divisibility and force a fresh compile)
            texts = texts + [""] * (self.batch_size - len(texts))
        return {
            "texts": texts,
            "lang_code": lang,
        }


# ------------------------------------------------------- language weighting
def language_probs_from_sizes(sizes: Sequence[float], alpha: float = 0.3) -> np.ndarray:
    """Language sampling probabilities ~ corpus_size^alpha, normalized
    (reference: train.py:259-266, MADLAD n_pages ^ language_sampling_alpha)."""
    p = np.asarray(sizes, dtype=np.float64) ** alpha
    return p / p.sum()


def load_language_list(path: str) -> Tuple[List[str], Optional[np.ndarray]]:
    """Parse a language-list .txt: one code per line, or "code,weight" lines
    whose weights become (normalized) sampling probabilities
    (reference: train.py:248-257)."""
    with open(path) as f:
        rows = [line.strip() for line in f if line.strip()]
    if rows and "," in rows[0]:
        langs = [r.split(",")[0].strip() for r in rows]
        weights = np.asarray([float(r.split(",")[1]) for r in rows])
        return langs, weights / weights.sum()
    return rows, None


def language_sizes_from_metadata(
    langs: Sequence[str], csv_path: str, size_column: str = "n_pages"
) -> np.ndarray:
    """Read per-language corpus sizes from a metadata CSV with a header row
    (e.g. MADLAD-400's `lang_code,n_pages` table; reference keeps it at
    data/madlad400_metadata.csv and indexes it in train.py:262)."""
    with open(csv_path) as f:
        header = f.readline().strip().split(",")
        key_i, size_i = header.index("lang_code"), header.index(size_column)
        table = {}
        for line in f:
            cells = line.strip().split(",")
            if len(cells) > max(key_i, size_i):
                table[cells[key_i]] = float(cells[size_i])
    missing = [l for l in langs if l not in table]
    if missing:
        raise KeyError(f"languages missing from {csv_path}: {missing}")
    return np.asarray([table[l] for l in langs])
