"""End-to-end training-data pipeline composition (SURVEY.md §3.J north star).

One query chaining the standalone operators the way a real corpus build does:
language-ID gate → near-dup cluster drop (keep representatives) → corpus
stats on the surviving documents. Every stage is the already-registered
operator (same builders, same semantics); the value of this entry is proving
the operators COMPOSE — one lazy plan, shuffle-keyed throughout, with a
single exact oracle over the whole chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recsys_spark_spark.catalog import table
from recsys_spark_spark.llm.dedup import _CLUSTER_EDGES_CTE, q_dedup_clusters
from recsys_spark_spark.llm.text import q_text_langid
from recsys_spark_spark.registry import query

_PIPELINE_ORACLE = f"""
WITH RECURSIVE {_CLUSTER_EDGES_CTE},
sym AS (
  SELECT d1 AS a, d2 AS b FROM edges UNION SELECT d2, d1 FROM edges
),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
drops AS (
  SELECT a AS doc_id FROM reach GROUP BY a HAVING a <> LEAST(a, MIN(b))
),
ltok AS (
  SELECT doc_id, t.token
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
),
votes AS (
  SELECT doc_id,
         SUM(CASE WHEN token IN ('the', 'and', 'of') THEN 1 ELSE 0 END) AS en_v,
         SUM(CASE WHEN token IN ('le', 'la', 'et') THEN 1 ELSE 0 END) AS fr_v,
         SUM(CASE WHEN token IN ('el', 'los', 'y') THEN 1 ELSE 0 END) AS es_v,
         SUM(CASE WHEN token IN ('der', 'und', 'die') THEN 1 ELSE 0 END) AS de_v
  FROM ltok GROUP BY 1
),
lid AS (
  SELECT doc_id FROM votes
  WHERE en_v > 0 OR fr_v > 0 OR es_v > 0 OR de_v > 0
),
kept AS (
  SELECT d.* FROM documents d
  JOIN lid ON lid.doc_id = d.doc_id
  WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       ROUND(SUM(CAST(n_chars AS BIGINT)) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_chars
FROM kept GROUP BY 1
"""


@query("q_pipeline_corpus", oracle=_PIPELINE_ORACLE)
def q_pipeline_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-pipe: corpus build = langid gate ∘ dup-cluster drop ∘ stats.

    - gate: docs whose marker-word language ID resolves (any vote > 0 ⟺
      predicted_lang != 'unknown' — the argmax branches all require a
      positive vote), via a left-semi join;
    - dedup: docs that are non-representative members of a near-dup cluster
      (q_dedup_clusters, is_rep = false) removed via a left-anti join;
    - stats: per-lang doc count, total whitespace tokens, mean n_chars.

    Both gate joins are keyed on doc_id against doc-count-sized sides —
    shuffle-hash-able and co-partitionable at any scale; nothing here is
    driver-side except the CC loop's convergence counter inherited from
    q_dedup_clusters.
    """
    d = table(spark, sf_dir, "documents")
    lid = q_text_langid(spark, sf_dir).where(F.col("predicted_lang") != "unknown").select("doc_id")
    drops = q_dedup_clusters(spark, sf_dir).where(~F.col("is_rep")).select("doc_id")
    kept = d.join(lid, "doc_id", "left_semi").join(drops, "doc_id", "left_anti")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tokens"),
        F.round(
            F.sum(F.col("n_chars").cast("long")) / F.count(F.lit(1)).cast("double"), 6
        ).alias("avg_chars"),
    )
