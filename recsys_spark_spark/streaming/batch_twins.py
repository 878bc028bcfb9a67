"""3.K — batch twins of the streaming computations (SURVEY.md §3.K strategy).

Each streaming operator is implemented twice: the batch DataFrame form here
(registered, DuckDB-oracled — the driver-checkable semantics) and the
Structured Streaming form in streaming/streams.py (asserted equal to the
batch twin in tests/test_streaming.py). Event time is truncated to seconds
everywhere: the source is ns-precision and Spark reads µs (SURVEY.md §7.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recsys_spark_spark.catalog import table
from recsys_spark_spark.functions.determinism import rlong
from recsys_spark_spark.registry import query

SESSION_GAP_S = 30 * 60


def events_with_sec(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").withColumn("sec", F.date_trunc("second", "ts"))


@query(
    "q_stream_tumbling",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n,
       SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) / 1e6 AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: tumbling 1h windows per event type (F.window ≡ date_trunc for
    epoch-aligned hours)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(rlong(F.col("value") * F.lit(1e6))) / F.lit(1e6)).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@query(
    "q_stream_sliding",
    oracle="""
WITH slid AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts) - (gs.k * INTERVAL 15 MINUTE) AS window_start,
         event_type
  FROM events CROSS JOIN generate_series(0, 3) gs(k)
)
SELECT window_start, event_type, COUNT(*) AS n
FROM slid
GROUP BY 1, 2
""",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2: sliding 1h windows every 15 min — each event lands in 4 windows
    (oracle expands the 4 covering window starts explicitly)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


SESSION_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, date_trunc('second', ts) AS sec FROM events
), flagged AS (
  SELECT user_id, event_id, sec,
         CASE WHEN date_diff('second',
                LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id), sec)
                >= {SESSION_GAP_S}
              OR LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM ev
), numbered AS (
  SELECT user_id, event_id, sec,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged
)
SELECT user_id, MIN(sec) AS session_start,
       COUNT(*) AS n_events,
       CAST(date_diff('second', MIN(sec), MAX(sec)) AS BIGINT) AS duration_s
FROM numbered
GROUP BY user_id, session_no
"""


@query("q_stream_session", oracle=SESSION_ORACLE)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: session windows (30-min gap) per user — batch twin via the classic
    lag + cumulative-sum sessionization. The streaming twin uses
    F.session_window; tests assert both produce identical sessions
    (boundary semantics: a gap of exactly 30min starts a NEW session, since
    Spark session windows are [start, last+gap) end-exclusive)."""
    ev = events_with_sec(spark, sf_dir).select("user_id", "event_id", "sec")
    order = Window.partitionBy("user_id").orderBy("sec", "event_id")
    prev_sec = F.lag("sec").over(order)
    flagged = ev.withColumn(
        "is_new",
        F.when(
            prev_sec.isNull()
            | ((F.unix_timestamp("sec") - F.unix_timestamp(prev_sec)) >= SESSION_GAP_S),
            1,
        ).otherwise(0),
    )
    cum = Window.partitionBy("user_id").orderBy("sec", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    numbered = flagged.withColumn("session_no", F.sum("is_new").over(cum))
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.min("sec").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_timestamp(F.max("sec")) - F.unix_timestamp(F.min("sec"))).alias("duration_s"),
        )
        .select("user_id", "session_start", "n_events", "duration_s")
    )


@query(
    "q_stream_dedup",
    oracle="""
SELECT event_type, COUNT(*) AS n
FROM (SELECT DISTINCT ON (event_id) event_id, event_type FROM events ORDER BY event_id)
GROUP BY 1
""",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 batch twin: exact-id dedup (event_id is unique in the source, so
    this is the identity — the streaming twin proves duplicates injected into
    the stream are dropped within the watermark)."""
    ev = table(spark, sf_dir, "events")
    return ev.dropDuplicates(["event_id"]).groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


ANOMALY_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, date_trunc('second', ts) AS sec,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
  FROM events
), seq AS (
  SELECT user_id, event_id, sec, is_err,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY sec, event_id) AS rn_all,
         ROW_NUMBER() OVER (PARTITION BY user_id, is_err ORDER BY sec, event_id) AS rn_grp
  FROM ev
), runs AS (
  SELECT user_id, COUNT(*) AS run_len
  FROM seq WHERE is_err = 1
  GROUP BY user_id, rn_all - rn_grp
)
SELECT user_id,
       COUNT(*) AS n_error_runs,
       CAST(MAX(run_len) AS BIGINT) AS max_run_len,
       CAST(SUM(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM runs GROUP BY 1
"""


@query("q_stream_anomaly", oracle=ANOMALY_ORACLE)
def q_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 batch twin: consecutive-error runs per user (gaps-and-islands);
    an 'anomaly' is a run of ≥3 consecutive errors. The streaming twin keeps
    the run counter in per-user state via transformWithStateInPandas/
    applyInPandasWithState (streams.py)."""
    ev = events_with_sec(spark, sf_dir).select(
        "user_id",
        "event_id",
        "sec",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
    )
    w_all = Window.partitionBy("user_id").orderBy("sec", "event_id")
    w_grp = Window.partitionBy("user_id", "is_err").orderBy("sec", "event_id")
    seq = ev.withColumn("rn_all", F.row_number().over(w_all)).withColumn(
        "rn_grp", F.row_number().over(w_grp)
    )
    runs = (
        seq.where(F.col("is_err") == 1)
        .groupBy("user_id", (F.col("rn_all") - F.col("rn_grp")).alias("island"))
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_error_runs"),
        F.max("run_len").cast("long").alias("max_run_len"),
        F.sum(F.when(F.col("run_len") >= 3, 1).otherwise(0)).cast("long").alias("n_anomalies"),
    )


@query(
    "q_stream_late_drop",
    oracle="""
WITH arr AS (
  SELECT ts,
         MAX(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm_high
  FROM events
)
SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n
FROM arr
WHERE ts >= wm_high - INTERVAL 10 MINUTE
GROUP BY 1
""",
)
def q_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 batch twin: per-row watermark reference semantics — arrival order is
    event_id order, the high-watermark is the running max event time, and a
    row whose ts trails the watermark by more than the 10-min delay is
    dropped before the tumbling count. This is the *strictest* (per-row)
    reading of Structured Streaming's watermark, which advances it only at
    batch boundaries — so the stream can only ever keep MORE rows than this
    twin drops; the injected-late-row pytest (tests/test_streaming.py) covers
    the real engine behavior.

    The global prefix max is DISTRIBUTED (round-5 rewrite, no unpartitioned
    window): arrival order is value-bucketed on event_id
    (operators.sorts.value_buckets — the same primitive as global_rank),
    the running max runs per bucket, and each bucket's carry-in is the max
    of all PRIOR buckets' maxima via a triangular join over the
    buckets-sized table; wm_high = greatest(local running max, carry-in).
    Prefix max is associative, so the split is exact for any boundary set —
    the classic parallel-prefix decomposition."""
    from recsys_spark_spark.operators.sorts import value_buckets

    ev = table(spark, sf_dir, "events").select("event_id", "ts")
    b = value_buckets(spark, ev, "event_id")
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("_wm_local", F.max("ts").over(w_in))
    bmax = b.groupBy("_bkt").agg(F.max("ts").alias("_bmax"))
    carry = (
        bmax.alias("a")
        .join(bmax.alias("b"), F.col("b._bkt") < F.col("a._bkt"), "left")
        .groupBy(F.col("a._bkt").alias("_bkt"))
        .agg(F.max("b._bmax").alias("_carry"))
    )
    arr = local.join(F.broadcast(carry), "_bkt").select(
        "ts", F.greatest("_wm_local", "_carry").alias("wm_high")
    )
    kept = arr.where(F.col("ts") >= F.col("wm_high") - F.expr("INTERVAL 10 MINUTES"))
    return (
        kept.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


@query(
    "q_stream_join",
    oracle="""
SELECT a.event_id AS click_id, b.event_id AS error_id, a.user_id,
       a.ts AS click_ts, b.ts AS error_ts
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'error'
 AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 5 MINUTE
""",
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7 batch twin: interval self-join — clicks matched to same-user errors
    within the next 5 minutes. The streaming twin (streams.stream_stream_join)
    is a watermarked stream-stream join whose time constraint is what bounds
    both state stores; batch expresses it as a range-condition join keyed on
    user_id (the equi-part shuffles, the interval predicate filters within
    the hash match — no cartesian)."""
    ev = table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    b = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("err_user"),
        F.col("ts").alias("error_ts"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("err_user"))
            & (F.col("error_ts") >= F.col("click_ts"))
            & (F.col("error_ts") < F.col("click_ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select("click_id", "error_id", "user_id", "click_ts", "error_ts")
    )


@query(
    "q_stream_profile",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) / 1e6 AS sum_value,
       CAST(FLOOR(epoch(MAX(date_trunc('second', ts)))) AS BIGINT) AS last_event_s
FROM events
GROUP BY user_id
""",
)
def q_stream_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6b batch twin: per-user running activity profile (event count,
    order-independent scaled-int value sum, last-seen second). The streaming
    twin folds the same three counters through keyed state — the Spark 4
    transformWithStateInPandas processor (streams.stream_profile) where its
    protobuf dependency exists, else the applyInPandasWithState twin
    (streams.stream_profile_applyinpandas; identical fold) — asserted
    equivalent in tests/test_streaming.py. State is one fixed-width tuple
    per user: bounded, partitioned by key, RocksDB-backed at scale."""
    ev = events_with_sec(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(rlong(F.col("value") * F.lit(1e6))) / F.lit(1e6)).alias("sum_value"),
        F.unix_timestamp(F.max("sec")).alias("last_event_s"),
    )


@query(
    "q_stream_enrich",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, c_mktsegment AS segment,
       COUNT(*) AS n,
       SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) / 1e6 AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
""",
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8: stream-static enrichment — the most common real streaming
    topology (join the event stream to a slowly-changing dimension, then
    window-aggregate by a dimension attribute). Batch twin: events ⋈
    customer on user_id, tumbling 1h windows per market segment. The
    streaming form (streams.stream_enrich) joins the SAME static
    DataFrame inside the micro-batch — Spark re-resolves the static side
    per trigger, no state store involvement for the join itself; only the
    windowed aggregate keeps state. Equivalence is pytest-asserted
    (tests/test_streaming.py), driver-oracled here.

    Shape at 100 TB: the dim side broadcasts per micro-batch (or bucketed
    joins for a huge dim); the aggregate state is windows × segments —
    tiny, mergeable scaled-int sums."""
    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(rlong(F.col("value") * F.lit(1e6))) / F.lit(1e6)).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "segment", "n", "sum_value")
    )


@query(
    "q_stream_chained",
    oracle="""
WITH q AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS w15, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT date_trunc('hour', w15) AS window_start, event_type,
       CAST(MAX(n) AS BIGINT) AS max_quarter_n,
       CAST(SUM(n) AS BIGINT) AS total_n
FROM q GROUP BY 1, 2
""",
)
def q_stream_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K9: CHAINED windowed aggregations — 15-min tumbling counts
    re-aggregated into hourly max/total per event type, both stages
    stateful. Spark supports multiple stateful operators in one streaming
    query (append mode) since 3.4/4.x — the pattern behind every
    multi-resolution rollup topology (fine windows feed coarse ones
    without a second pipeline). Batch twin here; the streaming form
    (streams.stream_chained) groups on window(window, '1 hour') over the
    first stage's window column, equivalence pytest-asserted with a
    watermark-advancing sentinel closing the final windows.

    Shape: stage-1 state is 15-min windows × types; stage-2 state is
    hours × types — both tiny, both keyed the same way (the hourly
    grouping is a coarsening of the quarter key, so at scale the second
    aggregate rides the first's partitioning)."""
    ev = table(spark, sf_dir, "events")
    q = ev.groupBy(
        F.window("ts", "15 minutes").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        q.groupBy(F.window(F.col("w.start"), "1 hour").alias("h"), "event_type")
        .agg(
            F.max("n").cast("long").alias("max_quarter_n"),
            F.sum("n").cast("long").alias("total_n"),
        )
        .select(F.col("h.start").alias("window_start"), "event_type", "max_quarter_n", "total_n")
    )


# --- K-cms: incremental Count-Min sketch maintenance ----------------------


def _cms_oracle() -> str:
    from recsys_spark_spark.operators.aggregates import _CMS_VALUES, CMS_P, CMS_W

    return f"""
WITH h(j, a, b) AS (VALUES {_CMS_VALUES})
SELECT h.j, ((h.a * e.user_id + h.b) % {CMS_P}) % {CMS_W} AS bucket,
       COUNT(*) AS cnt
FROM events e CROSS JOIN h
GROUP BY 1, 2
"""


@query("q_stream_cms", oracle=_cms_oracle())
def q_stream_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-cms batch twin: the Count-Min cell table of the events user_id
    stream — the sketch q_cms_heavy_hitters maintains over lineitem,
    here kept incrementally over an event stream. Because CMS cells are
    plain keyed SUMS (linear, pytest-pinned in the batch query), the
    Structured Streaming form (streams.stream_cms) is just the same
    groupBy in complete mode: micro-batch deltas fold into exactly the
    batch sketch, state bounded by d x w cells regardless of stream
    length — the canonical bounded-state streaming aggregate (no
    watermark needed, keys are sketch coordinates, not event keys)."""
    from recsys_spark_spark.operators.aggregates import cms_cells

    ev = table(spark, sf_dir, "events").select(F.col("user_id").alias("item"))
    return cms_cells(ev)
