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
    # Same single-exchange user_id partitioning discipline as
    # itemcf.interactions(): the whole downstream CF chain (self-join, score
    # agg, seen-filter, ui_agg) runs on this one partitioning.
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit(CUTOFF).cast("timestamp"))
        .select("o_orderkey", "o_custkey")
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .repartition("o_custkey")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("total_qty"))
    )


@query("q_eval_metrics", oracle=_EVAL_SQL)
def q_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Persisted: the train matrix feeds neighbors, scoring, the seen-filter,
    # and the coverage denominator. Fused neighbor path = one exchange,
    # identical output to cooccurrence→symmetrize→topk (itemcf docstring).
    ui = _train_interactions(spark, sf_dir).persist()
    neighbors = itemcf.topk_neighbors_fused(ui, itemcf.item_norms(ui)).select(
        "item_i", "item_j", "sim"
    )
    recs = itemcf.recommend(ui, neighbors).persist()

    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(CUTOFF).cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem")
    test = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
        .distinct()
    )

    # Five scalar counts as 1-row aggregates cross-joined into one lazy plan:
    # a single action, and Catalyst's exchange reuse dedups the shared recs/ui
    # subplans instead of recomputing the CF chain per metric (the eager
    # five-.count() form ran it three times).
    hits_agg = recs.join(test, ["user_id", "item_id"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    recs_agg = recs.agg(
        F.count(F.lit(1)).alias("n_recs"),
        F.countDistinct("item_id").alias("cov_num"),
    )
    test_agg = test.agg(F.count(F.lit(1)).alias("n_test"))
    ui_agg = ui.agg(F.countDistinct("item_id").alias("cov_den"))
    return (
        hits_agg.crossJoin(recs_agg)
        .crossJoin(test_agg)
        .crossJoin(ui_agg)
        .select(
            F.round(F.col("n_hits") / F.col("n_recs"), 6).alias("precision"),
            F.round(F.col("n_hits") / F.col("n_test"), 6).alias("recall"),
            F.round(F.col("cov_num") / F.col("cov_den").cast("double"), 6).alias("coverage"),
        )
    )
