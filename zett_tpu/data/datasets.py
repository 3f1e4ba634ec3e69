"""Datasets: infinite packed training stream + deterministic validation.

Reference: zett/dataset.py:14-192. TrainDataset packs texts greedily to
block_size*MAX_CHARS_PER_TOKEN chars joined by the eos token, samples
languages by probability, and gives each worker a disjoint shuffled order.
Sources are pluggable: in-memory text lists, parquet files, or HF datasets
on disk.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence

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


def _load_lang_texts(directory: str, lang: str):
    """Returns an indexable of texts for `lang` under `directory`."""
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
    def __init__(self, dset):
        self._dset = dset

    def __len__(self):
        return len(self._dset)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return self._dset[idx]["text"]
        return self._dset[int(idx)]["text"]


class TrainDataset(TorchIterableDataset):
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
    ):
        self.langs = list(langs)
        probs = (
            np.asarray(language_probs, dtype=np.float64)
            if language_probs is not None
            else np.ones(len(self.langs))
        )
        self.language_probs = probs / probs.sum()
        self.batch_size = batch_size
        self.block_size = block_size
        self.do_sequence_packing = do_sequence_packing
        self.min_char_length = block_size * MAX_CHARS_PER_TOKEN
        self.eos_token = eos_token

        self.dataset: Dict[str, object] = {}
        for lang in self.langs:
            if texts_by_lang is not None and lang in texts_by_lang:
                self.dataset[lang] = texts_by_lang[lang]
            else:
                assert train_directory is not None
                self.dataset[lang] = _load_lang_texts(train_directory, lang)

    def get_texts_in_each_language(self, n: int) -> Dict[str, List[str]]:
        return {lang: list(self.dataset[lang][:n]) for lang in self.langs}

    def get_texts(self, n: int) -> List[str]:
        texts: List[str] = []
        for batch in self:
            texts.extend(batch["texts"])
            if len(texts) >= n:
                break
        return texts[:n]

    def __iter__(self):
        info = get_worker_info()
        num_workers = info.num_workers if info is not None else 1
        worker_idx = info.id if info is not None else 0

        global_rs = {lang: np.random.RandomState(0) for lang in self.langs}
        local_rs = np.random.RandomState(worker_idx)

        orders = {
            lang: global_rs[lang].permutation(len(self.dataset[lang]))[worker_idx::num_workers]
            for lang in self.langs
        }
        position = {lang: 0 for lang in self.langs}

        while True:
            texts = []
            language = self.langs[0]
            for _ in range(self.batch_size):
                language = local_rs.choice(self.langs, p=self.language_probs)
                text = ""
                while len(text) < self.min_char_length:
                    index = int(orders[language][position[language]])
                    current = self.dataset[language][index].strip()
                    position[language] += 1
                    if position[language] == len(orders[language]):
                        orders[language] = global_rs[language].permutation(
                            len(self.dataset[language])
                        )[worker_idx::num_workers]
                        position[language] = 0
                    if not current:
                        continue
                    text += current
                    if not self.do_sequence_packing:
                        break
                    if self.eos_token is not None:
                        text += self.eos_token
                if self.do_sequence_packing and self.eos_token is not None:
                    text = text[: -len(self.eos_token)]
                texts.append(text)
            yield {
                "texts": texts,
                "lang_code": "all" if len(self.langs) > 1 else str(language),
            }


class ValidDataset(TorchDataset):
    def __init__(
        self,
        langs: Sequence[str],
        batch_size: int,
        n_subsample: Optional[int] = None,
        valid_directory: Optional[str] = None,
        texts_by_lang: Optional[Dict[str, List[str]]] = None,
    ):
        self.langs = list(langs)
        self.batch_size = batch_size
        self.dataset: Dict[str, List[str]] = {}
        for lang in self.langs:
            if texts_by_lang is not None and lang in texts_by_lang:
                texts = list(texts_by_lang[lang])
            else:
                assert valid_directory is not None
                src = _load_lang_texts(valid_directory, lang)
                texts = list(src[: n_subsample if n_subsample else len(src)])
            if n_subsample is not None:
                texts = texts[:n_subsample]
            self.dataset[lang] = texts

    def __len__(self):
        return sum(
            math.floor(len(self.dataset[lang]) / self.batch_size) for lang in self.langs
        )

    def __getitem__(self, idx):
        lang_idx = 0
        while idx >= math.floor(len(self.dataset[self.langs[lang_idx]]) / self.batch_size):
            idx -= math.floor(len(self.dataset[self.langs[lang_idx]]) / self.batch_size)
            lang_idx += 1
        lang = self.langs[lang_idx]
        return {
            "texts": self.dataset[lang][idx * self.batch_size : (idx + 1) * self.batch_size],
            "lang_code": lang,
        }


def language_probs_from_sizes(sizes: Sequence[float], alpha: float = 0.3) -> np.ndarray:
    """Language sampling probabilities ~ corpus_size^alpha
    (reference: train.py:259-266, MADLAD page counts ^ alpha)."""
    p = np.asarray(sizes, dtype=np.float64) ** alpha
    return p / p.sum()
