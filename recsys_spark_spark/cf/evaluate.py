"""I9: offline recommendation evaluation — precision / recall / coverage.

Time-based holdout (the only honest split for implicit feedback): train on
orders before CUTOFF, recommend, score against interactions on/after CUTOFF.
Reconstructed reference capability (SURVEY.md §3.I, [R:M]).

Metrics (single output row):
  precision = |recs ∩ test| / |recs|
  recall    = |recs ∩ test| / |test|
  coverage  = |distinct items recommended| / |distinct items in train|
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recsys_spark_spark.catalog import table
from recsys_spark_spark.cf import itemcf
from recsys_spark_spark.registry import query

CUTOFF = "2000-01-01"

# DuckDB oracle: the full CF chain with `orders` replaced by the train slice.
_TRAIN_ORDERS = f"(SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '{CUTOFF}')"
_TRAIN_CHAIN = itemcf.CF_CHAIN.replace(
    "FROM orders JOIN lineitem", f"FROM {_TRAIN_ORDERS} o JOIN lineitem"
)

_EVAL_SQL = f"""WITH {_TRAIN_CHAIN},
test AS (
  SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderdate >= TIMESTAMP '{CUTOFF}'
),
hits AS (
  SELECT COUNT(*) AS n_hits
  FROM recs JOIN test ON recs.user_id = test.user_id AND recs.item_id = test.item_id
)
SELECT
  ROUND(n_hits / (SELECT COUNT(*) FROM recs), 6) AS precision,
  ROUND(n_hits / (SELECT COUNT(*) FROM test), 6) AS recall,
  ROUND((SELECT COUNT(DISTINCT item_id) FROM recs)
        / CAST((SELECT COUNT(DISTINCT item_id) FROM ui) AS DOUBLE), 6) AS coverage
FROM hits"""


def _train_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit(CUTOFF).cast("timestamp"))
        .select("o_orderkey", "o_custkey")
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("total_qty"))
    )


@query("q_eval_metrics", oracle=_EVAL_SQL)
def q_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ui = _train_interactions(spark, sf_dir)
    sim = itemcf.cosine_similarity(itemcf.cooccurrence(ui), itemcf.item_norms(ui))
    neighbors = itemcf.topk_neighbors(itemcf.symmetrize(sim)).select("item_i", "item_j", "sim")
    recs = itemcf.recommend(ui, neighbors)

    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(CUTOFF).cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem")
    test = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
        .distinct()
    )

    n_hits = recs.join(test, ["user_id", "item_id"]).count()
    n_recs = recs.count()
    n_test = test.count()
    cov_num = recs.select("item_id").distinct().count()
    cov_den = ui.select("item_id").distinct().count()
    # Tiny driver-side combine of five scalar counts — not a data-plane collect.
    return spark.createDataFrame(
        [(round(n_hits / n_recs, 6), round(n_hits / n_test, 6), round(cov_num / cov_den, 6))],
        "precision double, recall double, coverage double",
    )
