"""GPT-2 byte <-> unicode-char maps.

Byte-level tokenizers store raw bytes as printable unicode characters so that
vocab files remain valid text. The construction is the standard GPT-2 one:
printable latin bytes map to themselves, everything else is shifted into the
U+0100.. range. Re-derived from the published algorithm (the reference embeds
the resulting table literally at zett/utils.py:351-609).
"""

from functools import lru_cache


@lru_cache(maxsize=1)
def _byte_to_char_map() -> dict:
    # bytes that are kept as-is: '!'..'~', '¡'..'¬', '®'..'ÿ'
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapping = {}
    n = 0
    for b in range(256):
        if b in keep:
            mapping[b] = chr(b)
        else:
            mapping[b] = chr(256 + n)
            n += 1
    return mapping


BYTES_TO_CHARS: dict = _byte_to_char_map()
CHARS_TO_BYTES: dict = {c: b for b, c in BYTES_TO_CHARS.items()}

# The 256-char byte alphabet in byte order.
BYTE_ALPHABET = tuple(BYTES_TO_CHARS[b] for b in range(256))


# latin-1 decode is the identity on bytes; one C-level str.translate then
# maps each unit through the table (vs. a per-char Python genexpr join,
# which dominated tokenizer-sampling time at ~32k pieces per sample)
_B2C_TRANS = str.maketrans({b: c for b, c in _byte_to_char_map().items()})
# inverse table: byte-char codepoint -> latin-1 char of the byte value.
# Codepoints < 0x100 that are NOT in the alphabet (raw control chars) map to
# an un-encodable char so .encode("latin-1") fails and the caller gets the
# documented KeyError via the fallback (they would otherwise pass through).
_C2B_TRANS = {ord(c): chr(b) for b, c in _byte_to_char_map().items()}
for _cp in range(0x100):
    _C2B_TRANS.setdefault(_cp, "￿")


def bytes_to_byte_chars(raw: bytes) -> str:
    """Encode raw bytes as the printable byte-char representation."""
    return raw.decode("latin-1").translate(_B2C_TRANS)


def text_to_byte_chars(text: str) -> str:
    """UTF-8 encode text, then map each byte to its printable char."""
    return bytes_to_byte_chars(text.encode("utf-8"))


def byte_chars_to_bytes(token: str) -> bytes:
    """Inverse of :func:`bytes_to_byte_chars`.

    Raises KeyError if `token` contains characters outside the byte alphabet
    (e.g. special tokens) — callers must handle those separately.
    """
    try:
        # same translate trick as bytes_to_byte_chars, inverted: map byte
        # chars into latin-1 range, then encode (C-speed)
        return token.translate(_C2B_TRANS).encode("latin-1")
    except UnicodeEncodeError:
        # non-alphabet char: fall back for the exact-KeyError contract
        m = CHARS_TO_BYTES
        return bytes(m[c] for c in token)


def byte_chars_to_text(token: str, errors: str = "replace") -> str:
    return byte_chars_to_bytes(token).decode("utf-8", errors=errors)
