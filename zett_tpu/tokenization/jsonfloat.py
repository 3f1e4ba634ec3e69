"""serde_json float-parsing emulation for byte-exact HF parity.

HF `tokenizers` loads tokenizer.json through Rust's serde_json, whose default
f64 parsing is NOT correctly rounded: it computes fl(fl(significand) * 10^k)
— one rounding to build the significand as a double (lossy beyond 2^53) and
one for the power-of-ten multiply/divide — instead of the correctly-rounded
decimal→binary conversion Python's json performs. On real Unigram vocabs
~25% of scores differ by 1 ulp between the two parsers, which silently flips
Viterbi tie-breaks (segmentations of periodic strings like "\\x20\\x20\\x20"
are piece-multiset permutations whose path scores collide exactly).

To match what HF *actually holds in memory* for the same file bytes, Unigram
scores are canonicalized through this emulation at deserialization time
(`Model.from_json`). The mapping is empirically a fixed point
over realistic score magnitudes (canon(canon(x)) == canon(x) for 350k fuzzed
values in [-40, 0]; rare 2-cycles exist for extreme magnitudes like 1e-30),
so re-serialization round-trips stably and an HF tokenizer built from our
`to_str()` output holds bit-identical scores.

Reference context: the reference repo outsources all of this to the HF crate
(zett/collator.py:166-175), inheriting serde semantics implicitly; we own the
stack (SURVEY §2.2 component 17) so we must reproduce them explicitly.
"""

from __future__ import annotations

import re
from typing import List, Sequence

import numpy as np

# serde_json's POW10 table entries are the f64 literals 1e0..1e308 (nearest
# doubles). Python float("1eK") is correctly rounded -> identical values.
_POW10 = [float(f"1e{k}") for k in range(309)]

_NUM = re.compile(r"^(\d+)(?:\.(\d+))?(?:[eE]([+-]?\d+))?$")


class SerdeFloat(float):
    """A float already parsed from its raw JSON decimal bytes through
    `serde_f64` (via the `parse_float` hook in `Tokenizer.from_str`).
    Marks the value as holding serde_json semantics so `Model.from_json`
    does not re-canonicalize it from its shortest repr — which matters
    when the file holds non-shortest literals (e.g. sentencepiece exports
    with full-precision digits): serde parses the ORIGINAL bytes, and
    repr(float(bytes)) can land 1 ulp elsewhere."""

    __slots__ = ()


def serde_parse_float(s: str) -> float:
    """json.loads `parse_float` hook: parse the raw decimal string the way
    serde_json does and mark the result as already-canonical."""
    return SerdeFloat(serde_f64(s))


def serde_f64(s) -> float:
    """Parse a JSON number the way serde_json's default (non-roundtrip)
    f64 path does. Accepts a decimal string or a float (uses its shortest
    repr, which is the string both serializers emit)."""
    if isinstance(s, float):
        s = repr(s)
    s = s.strip()
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    m = _NUM.match(s)
    if m is None:  # Infinity/NaN etc. — not produced by either serializer
        return -float(s) if neg else float(s)
    digits = m.group(1) + (m.group(2) or "")
    exponent = (int(m.group(3)) if m.group(3) else 0) - len(m.group(2) or "")
    sig = int(digits)
    if sig >= 1 << 64:  # serde takes a slower (correct) path; not reachable
        return -float(s) if neg else float(s)  # for shortest-repr doubles
    f = float(sig)  # rounds when sig > 2^53, exactly like `significand as f64`
    if exponent >= 0:
        f *= _POW10[min(exponent, 308)]
    else:
        f /= _POW10[min(-exponent, 308)]
    return -f if neg else f


def serde_canon(scores: Sequence[float]) -> List[float]:
    """Canonicalize a score list to the values HF would hold after reading
    our serialization. Values that are `SerdeFloat` (parsed from raw file
    bytes by `serde_parse_float`) already hold the serde value and pass
    through unchanged. C++ fast path when available (the sampled-tokenizer
    construction runs once per training batch over ~33k scores)."""
    if scores and all(isinstance(s, SerdeFloat) for s in scores):
        return [float(s) for s in scores]
    try:
        from ..csrc import host_lib as _hl
    except Exception:  # pragma: no cover - C++ lib optional
        _hl = None
    if _hl is not None and hasattr(_hl, "serde_canon_native"):
        arr = np.ascontiguousarray(scores, dtype=np.float64)
        return _hl.serde_canon_native(arr).tolist()
    return [serde_f64(s) for s in scores]
