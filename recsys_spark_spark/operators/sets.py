"""3.G — set operations (bag union, set union, intersect, except)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recsys_spark_spark.catalog import table
from recsys_spark_spark.registry import query


def _high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_custkey")
    )


def _urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )


_HIGH_SQL = "SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 400000"
_URGENT_SQL = "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"


@query("q_union_all", oracle=f"{_HIGH_SQL}\nUNION ALL\n{_URGENT_SQL}")
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: bag union — high-value ∪ urgent orders, duplicates kept."""
    return _high_value(spark, sf_dir).unionByName(_urgent(spark, sf_dir))


@query("q_union_distinct", oracle=f"{_HIGH_SQL}\nUNION\n{_URGENT_SQL}")
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: set union — same, deduplicated."""
    return _high_value(spark, sf_dir).unionByName(_urgent(spark, sf_dir)).distinct()


_BRAND_BUYERS = """
SELECT DISTINCT o_custkey FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
JOIN part ON p_partkey = l_partkey
WHERE p_brand = '{brand}'
"""


def _brand_buyers(spark: SparkSession, sf_dir: str, brand: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    p = F.broadcast(table(spark, sf_dir, "part").where(F.col("p_brand") == brand))
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .select("o_custkey")
        .distinct()
    )


@query(
    "q_intersect",
    oracle=(
        _BRAND_BUYERS.format(brand="Brand#1")
        + "INTERSECT\n"
        + _BRAND_BUYERS.format(brand="Brand#2")
    ),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: customers who bought both Brand#1 and Brand#2 parts."""
    return _brand_buyers(spark, sf_dir, "Brand#1").intersect(
        _brand_buyers(spark, sf_dir, "Brand#2")
    )


@query(
    "q_except",
    oracle=(
        "SELECT c_custkey FROM customer\nEXCEPT\n"
        + _BRAND_BUYERS.format(brand="Brand#1").replace("o_custkey", "o_custkey AS c_custkey", 1)
    ),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: set difference — customers who never bought a Brand#1 part."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    b = _brand_buyers(spark, sf_dir, "Brand#1").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(b)


_BRAND_BUYERS_ALL = """SELECT o_custkey
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
JOIN part ON l_partkey = p_partkey
WHERE p_brand = '{brand}'
"""


def _brand_buyers_all(spark: SparkSession, sf_dir: str, brand: str) -> DataFrame:
    """Per-purchase buyer bag (duplicates preserved) for one brand."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = F.broadcast(table(spark, sf_dir, "part").where(F.col("p_brand") == brand))
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .select("o_custkey")
    )


@query(
    "q_set_ops_all",
    oracle=(
        "SELECT 'intersect_all' AS op, o_custkey FROM (\n"
        + _BRAND_BUYERS_ALL.format(brand="Brand#1")
        + "INTERSECT ALL\n"
        + _BRAND_BUYERS_ALL.format(brand="Brand#2")
        + ")\nUNION ALL\nSELECT 'except_all' AS op, o_custkey FROM (\n"
        + _BRAND_BUYERS_ALL.format(brand="Brand#1")
        + "EXCEPT ALL\n"
        + _BRAND_BUYERS_ALL.format(brand="Brand#2")
        + ")"
    ),
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: multiset set operations — INTERSECT ALL / EXCEPT ALL over the
    per-purchase (not deduplicated) brand-buyer bags, tagged by operator.
    The ALL variants preserve multiplicity (a customer with 3 Brand#1 and
    2 Brand#2 purchases appears min(3,2)=2 times in the intersection,
    3−2=1 time in the difference) — bag semantics SQL mandates and G3/G4's
    distinct forms cannot express.

    Spark plans both as aggregate-then-generate (count per key on each
    side, replicate min(l,r) / greatest(l−r, 0) times) — two keyed
    aggregates + a row-local sequence explode, no join at all; the same
    shape at any scale."""
    b1 = _brand_buyers_all(spark, sf_dir, "Brand#1")
    b2 = _brand_buyers_all(spark, sf_dir, "Brand#2")
    ia = b1.intersectAll(b2).select(F.lit("intersect_all").alias("op"), "o_custkey")
    ea = b1.exceptAll(b2).select(F.lit("except_all").alias("op"), "o_custkey")
    return ia.unionByName(ea)
