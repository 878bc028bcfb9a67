"""3.J dedup — exact and near-duplicate detection over `documents`.

The 100 TB dedup ladder:
  J1 exact    — md5 groupBy: one shuffle on a 16-byte key, trivially scalable.
  J2 near/SQL — token-set Jaccard restricted to *blocked* candidate pairs
                (same lang + same n_chars). Blocking is what keeps near-dup
                sub-quadratic; the block key is the knob (at 100 TB you'd use
                length buckets + a cheap signature instead of exact length).
  J3 MinHash  — MLlib MinHashLSH banded approximate join: the real scale
                path, O(n·bands) candidates instead of O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recsys_spark_spark.catalog import table
from recsys_spark_spark.registry import query


@query(
    "q_dedup_exact",
    oracle="""
SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY 1
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: exact dedup — keep the smallest doc_id per content hash."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("text_md5"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "q_dedup_near_sql",
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id, t.token
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1
), cand AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM documents a JOIN documents b
    ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
), inter AS (
  SELECT c.d1, c.d2, COUNT(*) AS n_common
  FROM cand c
  JOIN tok t1 ON t1.doc_id = c.d1
  JOIN tok t2 ON t2.doc_id = c.d2 AND t2.token = t1.token
  GROUP BY 1, 2
)
SELECT d1, d2,
       ROUND(n_common / (s1.n + s2.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes s1 ON s1.doc_id = d1
JOIN sizes s2 ON s2.doc_id = d2
WHERE n_common / (s1.n + s2.n - n_common) >= 0.9
""",
)
def q_dedup_near_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: blocked token-Jaccard near-dup candidates (threshold 0.9)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token"))
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = d.select(F.col("doc_id").alias("d1"), "lang", "n_chars")
    b = d.select(F.col("doc_id").alias("d2"), "lang", "n_chars")
    cand = a.join(b, ["lang", "n_chars"]).where(F.col("d1") < F.col("d2")).select("d1", "d2")
    t1 = tok.select(F.col("doc_id").alias("d1"), "token")
    t2 = tok.select(F.col("doc_id").alias("d2"), "token")
    inter = (
        cand.join(t1, "d1")
        .join(t2, ["d2", "token"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    jac = F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .where(jac >= 0.9)
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
    )


@query("q_dedup_minhash_lsh")  # rows-only: LSH banding is seed-dependent
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: MinHash-LSH near-dup at scale — shingle→minhash→band→bucket join
    via MLlib (pyspark.ml.feature.MinHashLSH.approxSimilarityJoin)."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, Tokenizer

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = Tokenizer(inputCol="text", outputCol="tokens").transform(d)
    cv = CountVectorizer(inputCol="tokens", outputCol="features", binary=True, minDF=1.0)
    model = cv.fit(toks)
    vecs = model.transform(toks).select("doc_id", "features")
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    lsh_model = lsh.fit(vecs)
    pairs = lsh_model.approxSimilarityJoin(vecs, vecs, 0.2, distCol="jaccard_dist")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("d1"),
            F.col("datasetB.doc_id").alias("d2"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


@query(
    "q_dedup_simhash",
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id, t.token
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
), hashed AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(token), 25, 8)) AS BIGINT) AS h
  FROM tok
), bits AS (
  SELECT doc_id, gs.b AS bit,
         CASE WHEN SUM(CASE WHEN (h >> CAST(gs.b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) >= 0
              THEN 1 ELSE 0 END AS bitval
  FROM hashed, generate_series(0, 15) gs(b)
  GROUP BY doc_id, gs.b
)
SELECT doc_id, CAST(SUM(bitval * CAST(pow(2, bit) AS BIGINT)) AS BIGINT) AS simhash16
FROM bits GROUP BY 1
""",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2c: 16-bit SimHash fingerprint per document (Charikar 2002).

    Token hash must be engine-portable: Spark hash() is Murmur3(seed 42) and
    DuckDB hash() differs, so both sides use the last 8 hex digits of
    md5(token) as a 32-bit integer. Near-dup docs then differ in few bits
    (hamming distance over simhash16 — a bucket-join key at scale).
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token"))
    hashed = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 25, 8), 16, 10).cast("long").alias("h"),
    )
    bits = (
        hashed.join(F.broadcast(spark.range(0, 16).select(F.col("id").cast("int").alias("bit"))))
        .groupBy("doc_id", "bit")
        .agg(
            F.when(
                F.sum(F.when(F.expr("(h >> bit) & 1 = 1"), 1).otherwise(-1)) >= 0, 1
            )
            .otherwise(0)
            .alias("bitval")
        )
    )
    return bits.groupBy("doc_id").agg(
        F.sum(F.col("bitval") * F.pow(2, "bit").cast("long")).cast("long").alias("simhash16")
    )
