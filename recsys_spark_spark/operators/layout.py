"""3.M data-layout operators — Z-order clustering and small-file compaction.

The two table-maintenance jobs every 100 TB lake runs nightly:

- **Z-order**: multi-dimensional clustering so min/max file statistics prune
  scans filtered on EITHER dimension (the technique Delta OPTIMIZE ZORDER BY
  and the z-curve literature describe: interleave the bits of the dimensions'
  rank-space coordinates into one Morton key, then range-write on that key).
  Here the Morton key and the resulting per-file min/max envelope are
  computed engine-side and emitted as the layout-quality report a table
  optimizer would log.
- **Compaction planning**: bin-packing many small files into target-sized
  output groups WITHIN each hive partition (never across — rewriting across
  partition boundaries would break pruning). Manifests are metadata-sized,
  but the plan is still computed distributed: the running-total window is
  partitioned by the hive partition key.

Both are pure integer arithmetic end-to-end, so both carry exact DuckDB
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recsys_spark_spark.catalog import table
from recsys_spark_spark.registry import query

ZBITS = 8  # bits per dimension -> 16-bit Morton key, 64 buckets of 1024 keys
ZBUCKETS = 64


def _morton_sql(cx: str, dx: str, bits: int, div: str) -> str:
    """Bit-interleave via pure arithmetic — ``(x DIV 2^i) % 2`` instead of
    shift operators so ONE formula (modulo the integer-division spelling:
    Spark `DIV`, DuckDB `//`) serves both engines."""
    terms = []
    for i in range(bits):
        terms.append(f"(({cx} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({dx} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_Z_CTE = """
WITH span AS (
  SELECT MIN(o_custkey) AS ck0, MAX(o_custkey) AS ck1,
         MIN(o_orderdate) AS d0, MAX(o_orderdate) AS d1
  FROM orders
), coords AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(({B} * (o_custkey - ck0)) {DIV} (ck1 - ck0 + 1) AS BIGINT) AS cx,
         CAST(({B} * date_diff('day', d0, o_orderdate))
              {DIV} (date_diff('day', d0, d1) + 1) AS BIGINT) AS dx
  FROM orders, span
), keyed AS (
  SELECT o_orderkey, o_custkey, o_orderdate, ({MORTON}) AS zkey
  FROM coords
)
"""


def _z_oracle() -> str:
    cte = _Z_CTE.format(
        B=1 << ZBITS,
        DIV="//",
        MORTON=_morton_sql("cx", "dx", ZBITS, "//"),
    )
    return (
        cte
        + f"""
SELECT CAST(zkey // {(1 << (2 * ZBITS)) // ZBUCKETS} AS BIGINT) AS file_bucket,
       COUNT(*) AS n_rows,
       CAST(MIN(o_custkey) AS BIGINT) AS min_ck,
       CAST(MAX(o_custkey) AS BIGINT) AS max_ck,
       strftime(MIN(o_orderdate), '%Y-%m-%d') AS min_day,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_day
FROM keyed GROUP BY 1
"""
    )


@query("q_zorder_layout", oracle=_z_oracle())
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M97: Z-order (Morton) clustering layout for two-dimensional data
    skipping on orders(o_custkey, o_orderdate).

    Both dimensions are mapped to {ZBITS}-bit rank-space coordinates from a
    1-row broadcast min/max span, bit-interleaved into a Morton key by pure
    integer arithmetic (whole-stage-codegen friendly — no UDF), and grouped
    into ZBUCKETS z-range "files". The emitted report is each file's
    min/max envelope on BOTH dimensions — exactly the footer statistics a
    scan planner prunes with; z-ordering is what makes both envelopes
    narrow simultaneously (a linear sort makes one tight and the other
    full-span — compare tests/test_layout.py's envelope-width assertion).

    At 100 TB the same key feeds ``repartitionByRange(zkey).
    sortWithinPartitions(zkey)`` ahead of the writer; the stats table here
    is the audit artifact. One broadcast + one keyed aggregation — no extra
    shuffle beyond the agg's own."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    span = o.agg(
        F.min("o_custkey").alias("ck0"),
        F.max("o_custkey").alias("ck1"),
        F.min("o_orderdate").alias("d0"),
        F.max("o_orderdate").alias("d1"),
    )
    b = 1 << ZBITS
    coords = o.join(F.broadcast(span)).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.expr(f"CAST(({b} * (o_custkey - ck0)) DIV (ck1 - ck0 + 1) AS BIGINT)").alias("cx"),
        F.expr(
            f"CAST(({b} * datediff(o_orderdate, d0)) DIV (datediff(d1, d0) + 1) AS BIGINT)"
        ).alias("dx"),
    )
    keyed = coords.withColumn(
        "zkey", F.expr(_morton_sql("cx", "dx", ZBITS, "DIV"))
    )
    bucket_width = (1 << (2 * ZBITS)) // ZBUCKETS
    return (
        keyed.groupBy(
            F.expr(f"zkey DIV {bucket_width}").alias("file_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").cast("long").alias("min_ck"),
            F.max("o_custkey").cast("long").alias("max_ck"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("min_day"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_day"),
        )
    )


TARGET_BYTES = 64 * 1024  # compaction target per output group (test-scale)


@query(
    "q_compact_files_plan",
    oracle=f"""
WITH manifest AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         COUNT(*) AS n_rows,
         CAST(SUM(strlen(props) + 32) AS BIGINT) AS size_bytes
  FROM events GROUP BY 1, 2
), placed AS (
  SELECT event_type, day, n_rows, size_bytes,
         COALESCE(SUM(size_bytes) OVER (
            PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM manifest
)
SELECT event_type,
       CAST(cum_before // {TARGET_BYTES} AS BIGINT) AS bin_id,
       COUNT(*) AS n_files,
       CAST(SUM(size_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(n_rows) AS BIGINT) AS total_rows,
       strftime(MIN(day), '%Y-%m-%d') AS first_day,
       strftime(MAX(day), '%Y-%m-%d') AS last_day
FROM placed
GROUP BY 1, 2
""",
)
def q_compact_files_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M98: small-file compaction planner — the nightly OPTIMIZE job's
    decision step. The manifest models one file per (event_type, day) of a
    date-partitioned events table (size = exact byte proxy from payload
    lengths); files are packed into ~TARGET_BYTES output groups by a
    running-total window WITHIN each event_type partition (compaction never
    crosses hive partitions — that would break partition pruning), with
    ``bin = cum_bytes_before DIV target`` — the deterministic first-fit
    sequential packing Delta/Iceberg's OPTIMIZE uses for sorted manifests.

    Scale shape: manifests are metadata-sized (one row per FILE, not per
    data row), and even so the plan stays distributed — the running sum is
    keyed by the partition column; no driver-side loop, no collect. The
    output is the rewrite work-list: which files merge into which output
    group, with exact byte/row totals per group."""
    e = table(spark, sf_dir, "events")
    manifest = (
        e.select(
            "event_type",
            F.to_date("ts").alias("day"),
            (F.octet_length("props") + 32).alias("sz"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("sz").cast("long").alias("size_bytes"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = manifest.withColumn(
        "cum_before", F.coalesce(F.sum("size_bytes").over(w), F.lit(0))
    )
    return (
        placed.groupBy(
            "event_type",
            F.expr(f"cum_before DIV {TARGET_BYTES}").alias("bin_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size_bytes").cast("long").alias("total_bytes"),
            F.sum("n_rows").cast("long").alias("total_rows"),
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("first_day"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("last_day"),
        )
    )
