"""Global constants shared across the framework.

Parity notes: mirrors the semantics of the reference's constants
(/root/reference/zett/utils.py:22-29) — values are re-derived, not copied.
"""

# Fill value used to mask out logits / priors ("-inf" that is safe in bf16 sums).
NEGATIVE_INF_FILL_VALUE = -100_000

# Upper bound on characters a single token can cover; used to bound the text
# span fed to the tokenizer sampler (reference: zett/utils.py:24).
MAX_CHARS_PER_TOKEN = 16

EPSILON = 1e-8

# Number of texts used to estimate priors (reference: zett/utils.py:22).
PRIOR_ESTIMATION_SUBSAMPLE = 1_000_000

# The GPT-2-style pre-tokenization pattern. Tokens never span a
# letter/number/punctuation boundary and whitespace is attached to the front
# of the following word ("` ?`" alternations). `\s+(?!\S)` keeps trailing
# whitespace runs separate from the final word. (reference: zett/utils.py:29)
SPLIT_REGEX = r"'s|'t|'re|'ve|'m|'ll|'d| ?[\p{L}\p{M}]+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"

# Variant used by the reference Rust sampler (no \p{M}; rust_utils/src/lib.rs:27).
SPLIT_REGEX_NO_MARKS = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"

# Characters that byte-level encodings use for whitespace bytes we care about:
# space (0x20) -> "Ġ", newline (0x0A) -> "Ċ", tab (0x09) -> "ĉ".
EXTRA_WHITESPACE_CHARS = ("Ġ", "Ċ", "ĉ")

# Penalty applied to unknown characters during Unigram Viterbi, matching
# sentencepiece/HF tokenizers' kUnkPenalty.
UNK_PENALTY = 10.0
