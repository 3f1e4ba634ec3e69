"""Mint the eval-tokenizer artifact set into artifacts/tokenizers/.

The reference ships artifacts/tokenizers/{gpt2_raw, en_raw, de_raw,
gpt20001, gpt_neox0001, llama0001, mistral0001, roberta0001, bert0001,
starcoder0001}, each an HF tokenizer dir + priors.npy, minted by
scripts/make_spm.py (trained per-language tokenizers), scripts/
get_sampled_tokenizer.py (one sampled-vocab tokenizer per backbone family)
and zett/compute_prior.py (priors.npy). The reference's own artifact files
are git-lfs pointers (unavailable offline), so this script mints local
analogs with our own toolchain on deterministic offline corpora:

  gpt2_raw          the repo's 50k byte-level BPE (gpt2-structured) fixture
  en_raw, de_raw    native Unigram-EM trained per-language (spm.py replaces
                    the sentencepiece binary), byte-level
  <family>0001      one sampled-vocab Unigram tokenizer per backbone family
                    (what the training collator draws per batch), specials
                    matching that family's conventions
  starcoder0001     sampled from the code-heavy corpus with whitespace-run
                    pieces

Every dir gets priors.npy = {"substring", "token"} in the reference's
format (zett/compute_prior.py:158-166).

Usage:  python experiments/mint_artifacts.py [--output artifacts/tokenizers]
Deterministic: corpora are generated from fixed seeds; re-running
reproduces byte-identical tokenizers.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# ~200 common German words for the de_raw corpus (the reference trains
# de_raw on MADLAD-400 de, unavailable offline)
DE_WORDS = (
    "der die das und ist nicht ich du er sie es wir ihr sind war waren sein "
    "haben hatte hat werden wird wurde kann können konnte muss müssen sollte "
    "wollen will wollte machen macht gemacht gehen geht ging kommen kommt kam "
    "sehen sieht sah geben gibt gab nehmen nimmt nahm finden findet fand "
    "denken denkt dachte wissen weiß wusste sagen sagt sagte sprechen spricht "
    "ein eine einer einem einen eines kein keine mein dein sein unser euer "
    "dieser diese dieses jener welche alle viele wenige einige mehrere "
    "groß klein alt neu jung gut schlecht schön hässlich schnell langsam "
    "stark schwach hell dunkel warm kalt heiß lang kurz hoch tief breit "
    "über unter neben zwischen hinter vor nach bei mit ohne gegen für durch "
    "um an auf aus in zu von seit während wegen trotz statt "
    "Haus Hund Katze Mann Frau Kind Stadt Land Wasser Feuer Erde Luft "
    "Straße Größe Fuß weiß heißt dreißig Grüße natürlich möglich fröhlich "
    "Zeit Jahr Tag Nacht Woche Monat Stunde Minute Morgen Abend "
    "Arbeit Schule Universität Buch Zeitung Brief Wort Sprache Satz "
    "Regierung Wirtschaft Gesellschaft Entwicklung Wissenschaft Forschung "
    "Geschichte Zukunft Vergangenheit Gegenwart Möglichkeit Wirklichkeit "
    "heute morgen gestern jetzt dann immer nie oft manchmal selten wieder "
    "hier dort oben unten links rechts vorne hinten innen außen "
    "ja nein vielleicht auch noch schon nur sehr ganz wirklich ziemlich"
).split()

EN_WORDS = (
    "the of and to in is was he for it with as his on be at by i this had "
    "not are but from or have an they which one you were her all she there "
    "would their we him been has when who will more no if out so said what "
    "up its about into than them can only other new some could time these "
    "two may then do first any my now such like our over man me even most "
    "government people world country system development research history "
    "language science nature culture society economy question answer "
    "because through between against without within during before after "
    "house water fire earth children morning evening beautiful important "
    "different possible necessary available national international public"
).split()


EN_SUFFIXES = ["", "", "", "s", "ed", "ing", "ly", "er", "est", "tion",
               "ment", "ness", "able", "ful", "less", "ish"]
DE_SUFFIXES = ["", "", "", "e", "en", "er", "es", "em", "st", "te", "ten",
               "ung", "lich", "keit", "heit", "schaft", "chen", "lein"]


def _sentences(words, n_sentences, seed, compound_prob=0.0, suffixes=None):
    rng = random.Random(seed)
    weights = [1.0 / (i + 1) for i in range(len(words))]
    out = []
    for _ in range(n_sentences):
        n = rng.randint(4, 22)
        toks = rng.choices(words, weights=weights, k=n)
        if suffixes:
            # cheap morphology: realistic inflection expands the substring
            # inventory far beyond the bare word list
            toks = [t + rng.choice(suffixes) for t in toks]
        if compound_prob:
            # German-style compounds: glue two nouns together sometimes
            toks = [
                t + rng.choices(words, weights=weights, k=1)[0].lower()
                if rng.random() < compound_prob and t[:1].isupper()
                else t
                for t in toks
            ]
        s = " ".join(toks)
        out.append(s[0].upper() + s[1:] + rng.choice([".", ".", ".", "!", "?"]))
    return out


def _stdlib_english(max_lines=20000):
    """Real English prose: docstring/comment lines from the python stdlib
    (the only large body of natural English available offline)."""
    import glob
    import re

    word_rx = re.compile(r"^[A-Za-z][a-z]+$")
    lines = []
    for p in sorted(glob.glob("/usr/lib/python3*/*.py")):
        try:
            with open(p, errors="ignore") as f:
                src = f.read()
        except OSError:
            continue
        for line in src.splitlines():
            t = line.strip().lstrip("#").strip()
            words = t.split()
            if len(words) < 4:
                continue
            # mostly-alphabetic lines are prose, not code
            alpha = sum(1 for w in words if word_rx.match(w.strip(".,;:()\"'")))
            if alpha >= 0.8 * len(words):
                lines.append(t)
                if len(lines) >= max_lines:
                    return lines
    return lines


def build_corpora(cache_dir):
    """Returns {name: path} of corpus text files (one doc per line)."""
    os.makedirs(cache_dir, exist_ok=True)
    from fixtures import CORPUS, _make_big_corpus

    paths = {}

    def write(name, texts):
        p = os.path.join(cache_dir, name + ".txt")
        with open(p, "w") as f:
            for t in texts:
                t = t.replace("\n", " ").strip()
                if t:
                    f.write(t + "\n")
        paths[name] = p

    big = _make_big_corpus()  # ~6 MB code + English + 8-script synthetic
    write("en_code", big)
    en = (
        [t for t in CORPUS if t.strip() and t.isascii()] * 2
        + _stdlib_english()
        + _sentences(EN_WORDS, 12000, seed=11, suffixes=EN_SUFFIXES)
    )
    write("en", en)
    write("de", _sentences(DE_WORDS, 24000, seed=13, compound_prob=0.12,
                           suffixes=DE_SUFFIXES))
    # code-dominant subset: the python-source chunks of the big corpus
    code = [t for t in big if ("def " in t or "import " in t or "    " in t)]
    write("code", code)
    return paths


FAMILIES = {
    # family name -> (specials, corpus)
    "gpt20001": (["<|endoftext|>"], "en_code"),
    "gpt_neox0001": (["<|endoftext|>"], "en_code"),
    "llama0001": (["<unk>", "<s>", "</s>"], "en_code"),
    "mistral0001": (["<unk>", "<s>", "</s>"], "en_code"),
    "roberta0001": (["<s>", "<pad>", "</s>", "<unk>", "<mask>"], "en_code"),
    "bert0001": (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"], "en_code"),
    "starcoder0001": (["<|endoftext|>"], "code"),
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--output", default=os.path.join(REPO, "artifacts", "tokenizers"))
    ap.add_argument("--vocab-size", type=int, default=32768,
                    help="sampled-tokenizer vocab (training uses 32768)")
    ap.add_argument("--train-vocab-size", type=int, default=50000,
                    help="en_raw/de_raw trained vocab (reference: 50k spm)")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args(argv)

    from zett_tpu.tokenization.make_tokenizers import main as make_tok

    corpora = build_corpora(os.path.join(REPO, "tests", ".cache", "corpora"))

    def want(name):
        return args.only is None or name in args.only

    # ---- gpt2_raw: the 50k byte-level BPE fixture (gpt2-structured) ----
    if want("gpt2_raw"):
        from fixtures import _build_bpe_bytelevel_50k, _cached

        data = _cached("bpe_bytelevel_50k", _build_bpe_bytelevel_50k)
        out = os.path.join(args.output, "gpt2_raw")
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "tokenizer.json"), "w") as f:
            json.dump(data, f, ensure_ascii=False)
        # priors via the CLI path (reestimate + substring) on the big corpus
        from zett_tpu.tokenization import compute_prior

        compute_prior.main([
            "--tokenizer", os.path.join(out, "tokenizer.json"),
            "--data", corpora["en_code"], "--max-texts", "4000",
        ])
        from zett_tpu.tokenization.core import Tokenizer
        from zett_tpu.tokenization.make_tokenizers import _write_hf_sidecars

        _write_hf_sidecars(out, Tokenizer.from_file(os.path.join(out, "tokenizer.json")))
        print(f"gpt2_raw: copied 50k BPE fixture -> {out}")

    # ---- en_raw / de_raw: native Unigram-EM trained ----
    for name, corpus in (("en_raw", "en"), ("de_raw", "de")):
        if not want(name):
            continue
        make_tok([
            "--data", corpora[corpus], "--output", args.output, "--name", name,
            "--mode", "train", "--vocab-size", str(args.train_vocab_size),
            "--special-tokens", "<unk>",
        ])

    # ---- sampled-vocab tokenizers per backbone family ----
    for i, (name, (specials, corpus)) in enumerate(FAMILIES.items()):
        if not want(name):
            continue
        make_tok([
            "--data", corpora[corpus], "--output", args.output, "--name", name,
            "--mode", "sample", "--vocab-size", str(args.vocab_size),
            "--noise-std", "4.0", "--seed", str(100 + i),
            "--max-texts", "3000",
            "--special-tokens", *specials,
        ])

    print("done:", sorted(os.listdir(args.output)))


if __name__ == "__main__":
    main()
