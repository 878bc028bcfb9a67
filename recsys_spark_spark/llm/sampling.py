"""3.M sampling — reproducible, content-addressed dataset sampling.

A training-data pipeline needs samples that are (a) deterministic across
reruns and engines (no RNG state, no seed drift between Spark versions),
(b) stable under data growth (a row's sample membership never changes when
other rows arrive), and (c) shuffle-free. Content-addressed bucketing gives
all three: bucket = md5(key) mod 100 is a pure per-row expression — the 10%
sample of 100 TB is a filtered scan, not a job.

The hash must be engine-portable for the oracle: Spark hash() is Murmur3 and
DuckDB hash() differs, so both sides use the first 8 hex digits of md5 (same
trick as llm/dedup.py simhash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recsys_spark_spark.catalog import table
from recsys_spark_spark.registry import query

SAMPLE_PCT = 10
TRAIN_PCT = 80
PER_CLASS = 20


def _md5_bucket(col: F.Column) -> F.Column:
    """Deterministic bucket 0..99 from the md5 of a key's string form."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long") % 100)


_BUCKET_SQL = "CAST(('0x' || substring(md5(CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT) % 100"


@query(
    "q_sample_hash",
    oracle=f"""
WITH bucketed AS (
  SELECT doc_id, lang, n_chars,
         {_BUCKET_SQL.format(key="doc_id")} AS bucket
  FROM documents
)
SELECT doc_id, lang, n_chars, bucket,
       CASE WHEN bucket < {TRAIN_PCT} THEN 'train' ELSE 'test' END AS split
FROM bucketed
WHERE bucket < {SAMPLE_PCT} OR bucket >= {100 - (100 - TRAIN_PCT) // 2}
""",
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed sampling + split assignment in one pass: every row
    gets a stable bucket (md5(doc_id) mod 100); the filter keeps the 10%
    dev sample plus the top test tail. Pure row-local expressions — at
    100 TB this is a single filtered scan with no shuffle, and membership
    is reproducible forever."""
    d = table(spark, sf_dir, "documents")
    b = d.select(
        "doc_id", "lang", "n_chars", _md5_bucket(F.col("doc_id")).alias("bucket")
    )
    return b.where(
        (F.col("bucket") < SAMPLE_PCT) | (F.col("bucket") >= 100 - (100 - TRAIN_PCT) // 2)
    ).select(
        "doc_id",
        "lang",
        "n_chars",
        "bucket",
        F.when(F.col("bucket") < TRAIN_PCT, "train").otherwise("test").alias("split"),
    )


@query(
    "q_sample_balanced",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang,
         {_BUCKET_SQL.format(key="doc_id")} AS bucket
  FROM documents
)
SELECT doc_id, lang, rnk FROM (
  SELECT doc_id, lang,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS BIGINT) AS rnk
  FROM keyed
) WHERE rnk <= {PER_CLASS}
""",
)
def q_sample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsample: exactly PER_CLASS docs per language,
    chosen in content-hash order (pseudorandom but deterministic and
    growth-stable up to bucket boundaries). One window per class partition —
    at scale the per-class top-N is partition-parallel with the rank
    pushdown (WindowGroupLimit) pruning each partition to N rows."""
    d = table(spark, sf_dir, "documents")
    keyed = d.select("doc_id", "lang", _md5_bucket(F.col("doc_id")).alias("bucket"))
    w = Window.partitionBy("lang").orderBy("bucket", "doc_id")
    return (
        keyed.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= PER_CLASS)
        .select("doc_id", "lang", "rnk")
    )
