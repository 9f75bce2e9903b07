"""Fuzz the oracle-parity surface itself: for random strings, the
shared text primitives (tokenize / fingerprint / counts) must agree
byte-for-byte between Spark and DuckDB — the assumption every text
oracle rests on."""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bfr_clustering_using_pyspark_spark.functions.text import canonical_fingerprint, word_tokens

# printable-ish text incl. unicode, punctuation, digits, whitespace
texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
        min_size=0,
        max_size=80,
    ),
    min_size=1,
    max_size=8,
)


@given(texts)
@settings(max_examples=15, deadline=None)
def test_tokenize_and_fingerprint_parity(spark, batch):
    pdf = pd.DataFrame({"i": range(len(batch)), "t": batch})
    sdf = spark.createDataFrame(pdf)
    srows = (
        sdf.select(
            "i",
            F.size(word_tokens("t")).alias("n_tok"),
            canonical_fingerprint("t").alias("fp"),
        )
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    drows = con.sql(
        """
        SELECT i,
               len(regexp_extract_all(lower(t), '[a-z0-9]+')) AS n_tok,
               md5(coalesce(array_to_string(regexp_extract_all(lower(t), '[a-z0-9]+'), ' '), '')) AS fp
        FROM t ORDER BY i
        """
    ).fetchall()
    for s, d in zip(srows, drows):
        assert (s["n_tok"], s["fp"]) == (d[1], d[2]), f"text={batch[s['i']]!r}"
