"""Test fixtures: a diverse corpus and locally-trained HF tokenizers.

No network access exists in this environment, so instead of downloading
gpt2/xlm-r/llama tokenizers we train structurally-identical small ones with
the HF `tokenizers` library (fully offline) and differential-test against
them. Trained fixtures are cached under tests/.cache/.
"""

import json
import os
import random

import pytest

_CACHE = os.path.join(os.path.dirname(__file__), ".cache")
os.makedirs(_CACHE, exist_ok=True)


def _make_corpus():
    rng = random.Random(0)
    base = [
        "Hello world! This is a test of the tokenizer.",
        "The quick brown fox jumps over the lazy dog.",
        "  leading spaces and   multiple   spaces  ",
        "tabs\tand\nnewlines\r\nand\r carriage returns",
        "Zürich, naïve café, résumé — diacritics galore.",
        "日本語のテキストです。中文文本。한국어 텍스트.",
        "Привет мир! Ελληνικά. العربية. עברית.",
        "emoji 🤖🔥 and symbols ©®™ €$£¥ ±×÷",
        "don't can't won't it's we're I'll they'd you've I'm",
        "CamelCaseIdentifiers and snake_case_names and kebab-case-names",
        "def f(x):\n    return x ** 2  # comment\n",
        "for (int i = 0; i < n; ++i) { sum += a[i]; }",
        "1234567890 3.14159 1e-10 0xDEADBEEF",
        "https://example.com/path?query=value&other=1#frag",
        "a",
        "",
        " ",
        "\n\n\n",
        "    ",
        "ĠĊĉ byte-alphabet chars literally",
        "mixed English und Deutsch et français y español",
        "ThisIsAVeryLongWordWithoutAnySpacesWhatsoeverRepeated" * 3,
        "स्वागत है। வணக்கம். ሰላም።",
        "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝕞𝕒𝕥𝕙 𝗌𝗍𝗒𝗅𝖾𝖽 astral-plane",
    ]
    words = (
        "the of and to in is was he for it with as his on be at by i this had "
        "not are but from or have an they which one you were her all she there "
        "would their we him been has when who will more no if out so said what "
        "up its about into than them can only other new some could time these "
        "two may then do first any my now such like our over man me even most"
    ).split()
    for _ in range(200):
        n = rng.randint(3, 30)
        base.append(" ".join(rng.choice(words) for _ in range(n)))
    de_words = "der die das und ist nicht ich sie wir ihr haben werden können über für schön größe straße".split()
    for _ in range(50):
        base.append(" ".join(rng.choice(de_words) for _ in range(rng.randint(3, 15))))
    return base


CORPUS = _make_corpus()


def _cached(name, builder):
    path = os.path.join(_CACHE, name + ".json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    data = builder()
    with open(path, "w") as f:
        json.dump(data, f, ensure_ascii=False)
    return data


def _build_gpt2_like():
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, processors, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.post_processor = processors.ByteLevel(trim_offsets=True)
    trainer = trainers.BpeTrainer(
        vocab_size=2000,
        special_tokens=["<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS * 5, trainer)
    return json.loads(tok.to_str())


def _build_xlmr_like():
    from tokenizers import Tokenizer, decoders, models, normalizers, pre_tokenizers, processors, trainers

    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.Sequence(
        [normalizers.Replace(tokenizers_regex(" {2,}"), " ")]
    )
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁", prepend_scheme="always")
    tok.decoder = decoders.Metaspace(replacement="▁", prepend_scheme="always")
    trainer = trainers.UnigramTrainer(
        vocab_size=2000,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>"],
        unk_token="<unk>",
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS * 5, trainer)
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A </s>",
        pair="<s> $A </s> </s> $B </s>",
        special_tokens=[("<s>", tok.token_to_id("<s>")), ("</s>", tok.token_to_id("</s>"))],
    )
    return json.loads(tok.to_str())


def tokenizers_regex(pattern):
    from tokenizers import Regex

    return Regex(pattern)


def _build_llama_like():
    from tokenizers import Tokenizer, decoders, models, normalizers, trainers

    # sentencepiece-BPE style: metaspace normalizer, byte fallback, no pretok
    tok = Tokenizer(models.BPE(byte_fallback=True, fuse_unk=True, unk_token="<unk>"))
    tok.normalizer = normalizers.Sequence(
        [normalizers.Prepend("▁"), normalizers.Replace(" ", "▁")]
    )
    tok.decoder = decoders.Sequence(
        [
            decoders.Replace("▁", " "),
            decoders.ByteFallback(),
            decoders.Fuse(),
            decoders.Strip(" ", 1, 0),
        ]
    )
    byte_tokens = [f"<0x{b:02X}>" for b in range(256)]
    trainer = trainers.BpeTrainer(
        vocab_size=2000,
        special_tokens=["<unk>", "<s>", "</s>"] + byte_tokens,
        initial_alphabet=["▁"],
        show_progress=False,
    )
    tok.train_from_iterator(
        [t.replace(" ", "▁") for t in CORPUS * 5], trainer
    )
    return json.loads(tok.to_str())


def _build_bert_like():
    from tokenizers import Tokenizer, decoders, models, normalizers, pre_tokenizers, processors, trainers

    tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
    tok.normalizer = normalizers.BertNormalizer(lowercase=True)
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    tok.decoder = decoders.WordPiece(prefix="##")
    trainer = trainers.WordPieceTrainer(
        vocab_size=2000,
        special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"],
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS * 5, trainer)
    tok.post_processor = processors.BertProcessing(
        sep=("[SEP]", tok.token_to_id("[SEP]")),
        cls=("[CLS]", tok.token_to_id("[CLS]")),
    )
    return json.loads(tok.to_str())


@pytest.fixture(scope="session")
def gpt2_like_json():
    return _cached("gpt2_like", _build_gpt2_like)


@pytest.fixture(scope="session")
def xlmr_like_json():
    return _cached("xlmr_like", _build_xlmr_like)


@pytest.fixture(scope="session")
def llama_like_json():
    return _cached("llama_like", _build_llama_like)


@pytest.fixture(scope="session")
def bert_like_json():
    return _cached("bert_like", _build_bert_like)
