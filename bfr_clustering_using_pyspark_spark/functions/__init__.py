from .text import bpe_pretokens, canonical_fingerprint, word_tokens
from .vectors import cosine_sim, dot, l2_norm, to_double_array

__all__ = [
    "bpe_pretokens",
    "canonical_fingerprint",
    "word_tokens",
    "cosine_sim",
    "dot",
    "l2_norm",
    "to_double_array",
]
