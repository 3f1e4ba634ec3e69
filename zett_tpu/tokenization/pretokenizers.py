"""Pre-tokenizers: GPT-2-style regex split + byte-level mapping.

JSON-(de)serialization compatible with HF tokenizers so that tokenizer.json
files round-trip between the two stacks. The split semantics follow the
Split(pattern, behavior="removed"/"isolated", invert) contract
(reference usage: zett/collator.py:408-411, zett/tokenizer_converters.py:179-197).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import regex as _re

from ..constants import SPLIT_REGEX, SPLIT_REGEX_NO_MARKS
from .bytemaps import BYTES_TO_CHARS

# (pretoken, (char_start, char_end)) relative to the normalized text
Pretoken = Tuple[str, Tuple[int, int]]

_COMPILED = {}


def _compiled(pattern: str):
    rx = _COMPILED.get(pattern)
    if rx is None:
        rx = _COMPILED[pattern] = _re.compile(pattern)
    return rx


class PreTokenizer:
    def pre_tokenize_str(self, text: str) -> List[Pretoken]:
        raise NotImplementedError

    def to_json(self) -> dict:
        raise NotImplementedError

    @staticmethod
    def from_json(data: Optional[dict]) -> Optional["PreTokenizer"]:
        if data is None:
            return None
        t = data["type"]
        if t == "Sequence":
            return Sequence([PreTokenizer.from_json(p) for p in data["pretokenizers"]])
        if t == "Split":
            pattern = data["pattern"]
            pattern = pattern["Regex"] if "Regex" in pattern else _re.escape(pattern["String"])
            return Split(pattern, behavior=data["behavior"], invert=data["invert"])
        if t == "ByteLevel":
            return ByteLevel(
                add_prefix_space=data.get("add_prefix_space", True),
                use_regex=data.get("use_regex", True),
                trim_offsets=data.get("trim_offsets", True),
            )
        if t == "Whitespace":
            return Split(r"\w+|[^\w\s]+", behavior="Removed", invert=True)
        if t == "WhitespaceSplit":
            return Split(r"\S+", behavior="Removed", invert=True)
        if t == "Metaspace":
            return Metaspace(
                replacement=data.get("replacement", "▁"),
                prepend_scheme=data.get("prepend_scheme", "always"),
                split=data.get("split", True),
            )
        if t == "Digits":
            return Digits(individual_digits=data.get("individual_digits", False))
        if t == "BertPreTokenizer":
            return BertPreTokenizer()
        if t == "Punctuation":
            return Split(r"\p{P}", behavior=data.get("behavior", "Isolated"), invert=False)
        raise ValueError(f"Unsupported pre_tokenizer type: {t}")


class Sequence(PreTokenizer):
    def __init__(self, pretokenizers):
        self.pretokenizers = [p for p in pretokenizers if p is not None]

    def pre_tokenize_str(self, text: str) -> List[Pretoken]:
        pieces: List[Pretoken] = [(text, (0, len(text)))]
        for p in self.pretokenizers:
            nxt: List[Pretoken] = []
            for piece, (start, _) in pieces:
                for sub, (s, e) in p.pre_tokenize_str(piece):
                    nxt.append((sub, (start + s, start + e)))
            pieces = nxt
        return pieces

    def to_json(self) -> dict:
        return {
            "type": "Sequence",
            "pretokenizers": [p.to_json() for p in self.pretokenizers],
        }


class Split(PreTokenizer):
    """Regex split. With invert=True the pattern describes the *tokens*."""

    def __init__(self, pattern: str, behavior: str = "Removed", invert: bool = False):
        self.pattern = pattern
        self.behavior = behavior
        self.invert = invert
        self._rx = _compiled(pattern)

    def pre_tokenize_str(self, text: str) -> List[Pretoken]:
        behavior = self.behavior.lower()
        out: List[Pretoken] = []
        if self.invert:
            # matches become the pretokens; gaps are dropped (behavior applies
            # to the *delimiter*, which under invert is the non-matching part)
            for m in self._rx.finditer(text):
                if m.start() != m.end():
                    out.append((m.group(), (m.start(), m.end())))
            return out
        prev = 0
        for m in self._rx.finditer(text):
            s, e = m.start(), m.end()
            if s == e:
                continue
            if prev < s:
                out.append((text[prev:s], (prev, s)))
            if behavior == "isolated":
                out.append((text[s:e], (s, e)))
            elif behavior == "merged_with_previous" and out:
                last, (ls, _) = out.pop()
                out.append((last + text[s:e], (ls, e)))
            elif behavior == "merged_with_next":
                # handled by deferring: emit as its own piece and merge below
                out.append((text[s:e], (s, e)))
            # "removed": drop the delimiter
            prev = e
        if prev < len(text):
            out.append((text[prev:], (prev, len(text))))
        return out

    def to_json(self) -> dict:
        return {
            "type": "Split",
            "pattern": {"Regex": self.pattern},
            "behavior": self.behavior.capitalize() if self.behavior.islower() else self.behavior,
            "invert": self.invert,
        }


class ByteLevel(PreTokenizer):
    """Map pretokens to the printable byte alphabet (GPT-2 style).

    With use_regex=True the GPT-2 regex split runs first; add_prefix_space
    prepends a space to the text if it doesn't start with one.
    """

    def __init__(self, add_prefix_space: bool = True, use_regex: bool = True, trim_offsets: bool = True):
        self.add_prefix_space = add_prefix_space
        self.use_regex = use_regex
        self.trim_offsets = trim_offsets

    def pre_tokenize_str(self, text: str) -> List[Pretoken]:
        offset_shift = 0
        if self.add_prefix_space and text and not text.startswith(" "):
            text = " " + text
            offset_shift = -1  # offsets refer to the original string
        if self.use_regex:
            pieces = [
                (m.group(), (m.start(), m.end()))
                for m in _compiled(SPLIT_REGEX_NO_MARKS).finditer(text)
            ]
        else:
            pieces = [(text, (0, len(text)))] if text else []
        b2c = BYTES_TO_CHARS
        out: List[Pretoken] = []
        for piece, (s, e) in pieces:
            mapped = "".join(b2c[b] for b in piece.encode("utf-8"))
            out.append((mapped, (max(s + offset_shift, 0), max(e + offset_shift, 0))))
        return out

    def to_json(self) -> dict:
        return {
            "type": "ByteLevel",
            "add_prefix_space": self.add_prefix_space,
            "trim_offsets": self.trim_offsets,
            "use_regex": self.use_regex,
        }


class Metaspace(PreTokenizer):
    """SentencePiece-style: replace spaces with the metaspace char."""

    def __init__(self, replacement: str = "▁", prepend_scheme: str = "always", split: bool = True):
        self.replacement = replacement
        self.prepend_scheme = prepend_scheme
        self.split = split

    def pre_tokenize_str(self, text: str) -> List[Pretoken]:
        if self.prepend_scheme in ("always", "first") and text and not text.startswith(" "):
            text = " " + text
        replaced = text.replace(" ", self.replacement)
        if not self.split:
            return [(replaced, (0, len(text)))] if replaced else []
        out: List[Pretoken] = []
        rx = _compiled(_re.escape(self.replacement) + r"[^" + _re.escape(self.replacement) + r"]*")
        for m in rx.finditer(replaced):
            out.append((m.group(), (m.start(), m.end())))
        if not out and replaced:
            out = [(replaced, (0, len(replaced)))]
        return out

    def to_json(self) -> dict:
        return {
            "type": "Metaspace",
            "replacement": self.replacement,
            "prepend_scheme": self.prepend_scheme,
            "split": self.split,
        }


class BertPreTokenizer(PreTokenizer):
    """Whitespace split, then isolate each punctuation character."""

    # "punctuation" here matches HF/bert semantics: unicode P plus the ASCII
    # symbol chars that is_ascii_punctuation covers ($ + < = > ^ ` | ~).
    _PUNCT = r"[\p{P}$+<=>^`|~]"

    def pre_tokenize_str(self, text: str) -> List[Pretoken]:
        out: List[Pretoken] = []
        rx = _compiled(rf"[^\s{self._PUNCT[1:-1]}]+|{self._PUNCT}")
        for m in rx.finditer(text):
            out.append((m.group(), (m.start(), m.end())))
        return out

    def to_json(self) -> dict:
        return {"type": "BertPreTokenizer"}


class Digits(PreTokenizer):
    def __init__(self, individual_digits: bool = False):
        self.individual_digits = individual_digits

    def pre_tokenize_str(self, text: str) -> List[Pretoken]:
        pattern = r"\p{N}" if self.individual_digits else r"\p{N}+"
        return Split(pattern, behavior="Isolated", invert=False).pre_tokenize_str(text)

    def to_json(self) -> dict:
        return {"type": "Digits", "individual_digits": self.individual_digits}


def gpt2_split(text: str, with_marks: bool = True) -> List[str]:
    """Standalone GPT-2 regex split (the ZeTT SPLIT_REGEX)."""
    rx = _compiled(SPLIT_REGEX if with_marks else SPLIT_REGEX_NO_MARKS)
    return [m.group() for m in rx.finditer(text)]
