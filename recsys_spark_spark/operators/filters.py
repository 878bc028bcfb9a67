"""3.B — projection, filter, row-level expressions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recsys_spark_spark.catalog import table
from recsys_spark_spark.functions.determinism import osum, rlong
from recsys_spark_spark.registry import query


@query(
    "q_filter_range",
    oracle=f"""
SELECT {osum("l_extendedprice * l_discount")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: TPC-H Q6 shape — conjunctive range predicates, all pushed to scan."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(rlong(F.col("l_extendedprice") * F.col("l_discount") * F.lit(1e6))) / F.lit(1e6)).alias("revenue")
        )
    )


@query(
    "q_project_expr",
    oracle="""
SELECT o_orderkey,
       FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100 AS taxed_price,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
            ELSE 'cold' END AS heat,
       CAST(year(o_orderdate) AS BIGINT) AS o_year
FROM orders
""",
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: arithmetic + CASE WHEN projection (row-level, codegen-fused).

    The taxed price uses floor(x*100+0.5)/100 instead of round(x, 2): Spark
    rounds via decimal string conversion, DuckDB on the raw double — they
    disagree on ~0.1% of boundary values, while floor on the identical double
    is bit-stable across engines (SURVEY.md §7.5 floats pitfall)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.floor(F.col("o_totalprice") * 1.1 * 100 + 0.5) / 100).alias("taxed_price"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "warm")
        .otherwise("cold")
        .alias("heat"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    )


@query(
    "q_filter_in_null",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       NULLIF(o_orderstatus, 'P') AS status_or_null,
       (NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM 'O') AS is_open
FROM orders
WHERE o_orderstatus IN ('O', 'P') AND o_totalprice IS NOT NULL
""",
)
def q_filter_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: IN-list, IS NULL, null-safe equality (<=> / IS NOT DISTINCT FROM)."""
    o = table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.where(
        F.col("o_orderstatus").isin("O", "P") & F.col("o_totalprice").isNotNull()
    ).select(
        "o_orderkey",
        "o_orderstatus",
        status_or_null.alias("status_or_null"),
        status_or_null.eqNullSafe(F.lit("O")).alias("is_open"),
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: row dedup — hash aggregate on all projected columns."""
    return table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()
