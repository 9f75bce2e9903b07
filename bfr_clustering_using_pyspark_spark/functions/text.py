"""Text column functions shared by textstats/dedup operators.

Regex patterns stay in the RE2/Java-common subset so DuckDB oracles
produce identical token streams.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def word_tokens(col) -> Column:
    """Lowercased word tokens (letters+digits runs)."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0)


def bpe_pretokens(col) -> Column:
    """BPE-ish pre-tokenization: letter runs / digit runs / single
    punctuation marks."""
    return F.regexp_extract_all(col, F.lit(BPE_RE), 0)


def canonical_fingerprint(col) -> Column:
    """md5 over the normalized token stream — case/punct/whitespace
    insensitive document identity."""
    return F.md5(F.array_join(word_tokens(col), " "))
