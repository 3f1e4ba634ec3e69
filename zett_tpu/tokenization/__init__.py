"""Host tokenization stack: the framework-owned replacement for the HF
`tokenizers` Rust crate + the reference's rust_utils (SURVEY §2.2)."""

from .bytemaps import (
    BYTE_ALPHABET,
    BYTES_TO_CHARS,
    CHARS_TO_BYTES,
    byte_chars_to_bytes,
    byte_chars_to_text,
    bytes_to_byte_chars,
    text_to_byte_chars,
)
from .core import AddedToken, Encoding, Tokenizer
from .models import BPE, Model, Unigram, WordPiece

__all__ = [
    "AddedToken",
    "BPE",
    "BYTE_ALPHABET",
    "BYTES_TO_CHARS",
    "CHARS_TO_BYTES",
    "Encoding",
    "Model",
    "Tokenizer",
    "Unigram",
    "WordPiece",
    "byte_chars_to_bytes",
    "byte_chars_to_text",
    "bytes_to_byte_chars",
    "text_to_byte_chars",
]
