"""3.C — join strategies.

Physical-plan intent per query (asserted in tests/test_plans.py):
- C2/C10 broadcast the dims (BroadcastHashJoin) — never shuffle a 25-row table.
- C1/C6 shuffle on the join key (SMJ/shuffled-hash, AQE's call).
- C7 keeps an equi component so Spark never falls back to BNLJ.
- C8 implements as-of via union + last_value window — sort-based, linear, the
  scalable form (a per-row theta join would be quadratic per user).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recsys_spark_spark.catalog import table
from recsys_spark_spark.functions.determinism import osum, rlong
from recsys_spark_spark.registry import query


@query(
    "q_join_inner",
    oracle="""
SELECT o_orderkey, c_custkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@query(
    "q_join_broadcast",
    oracle="""
SELECT c_custkey, c_name, n_name, r_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: snowflake dims broadcast explicitly — zero shuffle of customer."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "q_join_outer",
    oracle="""
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY 1
""",
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: left outer join — customers with zero orders kept (count = 0)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey AND o_orderstatus = 'O')
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c.c_custkey AND o_totalprice > 300000
)
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: anti join — the CF 'exclude already-seen items' primitive.
    Customers with no big-ticket (>300k) order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_self_pairs",
    oracle="""
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_pairs
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
""",
)
def q_join_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: basket co-occurrence — parts appearing on the same order.

    Same shape as CF item co-occurrence but keyed on orderkey; order baskets
    are naturally capped (≤7 lines) so no skew guard needed here.
    """
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = l.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = l.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "q_join_theta_range",
    oracle="""
WITH s AS (
  SELECT event_id, user_id, date_trunc('second', ts) AS s_sec
  FROM events WHERE event_type = 'signup'
), e AS (
  SELECT user_id, date_trunc('second', ts) AS e_sec
  FROM events WHERE event_type <> 'signup'
)
SELECT s.event_id AS signup_event_id, COUNT(e.user_id) AS n_followups
FROM s LEFT JOIN e
  ON s.user_id = e.user_id
 AND e.e_sec > s.s_sec
 AND e.e_sec <= s.s_sec + INTERVAL 1 HOUR
GROUP BY 1
""",
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: range join with an equi component (user_id) — events within 1h
    after each signup. Timestamps truncated to seconds on both sides: the
    events table is ns-precision and Spark truncates ns→µs on read
    (SURVEY.md §7.5), so sub-second comparisons would diverge from the oracle.
    """
    ev = table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "signup").select(
        "event_id", "user_id", F.date_trunc("second", "ts").alias("s_sec")
    )
    e = ev.where(F.col("event_type") != "signup").select(
        F.col("user_id").alias("e_user"), F.date_trunc("second", "ts").alias("e_sec")
    )
    return (
        s.join(
            e,
            (s.user_id == e.e_user)
            & (e.e_sec > s.s_sec)
            & (e.e_sec <= s.s_sec + F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .groupBy(F.col("event_id").alias("signup_event_id"))
        .agg(F.count("e_user").alias("n_followups"))
    )


@query(
    "q_join_asof",
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, date_trunc('second', ts) AS sec,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag
  FROM events WHERE event_type IN ('click', 'purchase')
), m AS (
  SELECT event_id, user_id, tag,
         LAST_VALUE(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY sec, tag, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_event_id
  FROM ev
)
SELECT event_id AS purchase_event_id, user_id, click_event_id
FROM m WHERE tag = 1
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: as-of join — for each purchase, the latest click at-or-before it
    (per user, second granularity, ties broken by event_id).

    Implemented as union + last_value(ignore nulls) window: one sort per user
    partition, linear in events — the form that scales (native merge_asof
    exists only in pandas-on-Spark; a theta join would be quadratic).
    """
    ev = table(spark, sf_dir, "events").where(F.col("event_type").isin("click", "purchase"))
    tagged = ev.select(
        "event_id",
        "user_id",
        F.date_trunc("second", "ts").alias("sec"),
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(F.lit(1)).alias("tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "click_event_id",
        F.last(F.when(F.col("tag") == 0, F.col("event_id")), ignorenulls=True).over(w),
    )
    return carried.where(F.col("tag") == 1).select(
        F.col("event_id").alias("purchase_event_id"), "user_id", "click_event_id"
    )


@query(
    "q_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: cartesian product of two dims (BroadcastNestedLoopJoin)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q_join_multiway",
    oracle=f"""
SELECT n_name, {osum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
""",
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10: TPC-H Q5-shaped star join — dims broadcast, facts shuffle once."""
    r = F.broadcast(table(spark, sf_dir, "region"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("n_name")
        .agg(
            (F.sum(rlong(F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6))) / F.lit(1e6)).alias("revenue")
        )
    )


@query(
    "q_join_salted",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_events,
       SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) / 1e6 AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1
""",
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: salted shuffle join — the manual skew-mitigation pattern.

    When one join key dominates (a hot user at 100 TB), a plain shuffle join
    sends its entire fan-in to one task. Salting splits each hot key into
    SALT synthetic sub-keys: the big (skewed) side gets a deterministic salt
    from a content hash, the small side is exploded SALT-fold, and the join
    runs on (key, salt) — every sub-key lands on a different task, bounding
    any task's share of a hot key at 1/SALT. Deterministic salt (xxhash64 of
    the row id, not rand()) keeps the query re-runnable and oracle-exact;
    semantics are identical to the plain join, which is exactly what the
    oracle states. AQE's skew-join split handles residual post-hoc skew;
    salting is the a-priori version that also works for aggregates.

    The hint keeps the exploded dim from auto-broadcasting (at real scale it
    may exceed the threshold; the demo pins the salted-shuffle shape so the
    plan is the one the technique produces).
    """
    SALT = 8
    ev = table(spark, sf_dir, "events").withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)])))
        .hint("shuffle_hash")
    )
    return (
        ev.join(
            cust,
            (ev.user_id == cust.c_custkey) & (ev._salt == cust._salt.cast("long")),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(rlong(F.col("value") * F.lit(1e6))) / F.lit(1e6)).alias("sum_value"),
        )
    )
