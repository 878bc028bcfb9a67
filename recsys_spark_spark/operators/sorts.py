"""3.F — sorts, limits, top-k.

F1 compiles to TakeOrderedAndProject (per-partition heap + driver merge of k
rows — no global sort even at 100 TB). F2 is the grouped top-k window form.
Since the driver's value-hash is order-insensitive, orderings are made
observable by materializing rank columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recsys_spark_spark.catalog import table
from recsys_spark_spark.functions.determinism import osum, rlong
from recsys_spark_spark.registry import query


@query(
    "q_orderby_limit",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: global top-k — largest orders, ties broken by key."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_topk_per_group",
    oracle=f"""
WITH rev AS (
  SELECT p_brand, l_partkey, {osum("l_extendedprice * (1 - l_discount)")} AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT p_brand, l_partkey, revenue, rnk FROM (
  SELECT p_brand, l_partkey, revenue,
         CAST(ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue DESC, l_partkey) AS BIGINT) AS rnk
  FROM rev
) WHERE rnk <= 3
""",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: top-3 parts by revenue per brand — window row_number form (the
    same physical plan Catalyst derives; per-brand parallel)."""
    l = table(spark, sf_dir, "lineitem")
    p = F.broadcast(table(spark, sf_dir, "part"))
    rev = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(
            (F.sum(rlong(F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6))) / F.lit(1e6)).alias("revenue")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("revenue").desc(), F.col("l_partkey"))
    return (
        rev.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
    )


@query(
    "q_sort_multi",
    oracle="""
WITH agg AS (
  SELECT c_custkey, MAX(o_totalprice) AS max_price
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY 1
)
SELECT c_custkey, max_price,
       CAST(ROW_NUMBER() OVER (ORDER BY max_price DESC NULLS LAST, c_custkey) AS BIGINT) AS pos
FROM agg
""",
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: multi-key sort with explicit null ordering (desc_nulls_last) —
    Spark's default (nulls first on asc) differs from DuckDB's, so both sides
    pin NULLS LAST explicitly (SURVEY.md §7.5)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    agg = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.max("o_totalprice").alias("max_price"))
    )
    w = Window.orderBy(F.col("max_price").desc_nulls_last(), F.col("c_custkey"))
    return agg.select(
        "c_custkey", "max_price", F.row_number().over(w).cast("long").alias("pos")
    )
