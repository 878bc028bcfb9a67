"""Table catalog: scale-factor directory -> named DataFrames / temp views.

Mirrors the reference's Hive-table sourcing (SURVEY.md §2.1) with parquet +
temp views. At 100 TB these would be date-partitioned, key-bucketed external
tables; the loader is the single place that knowledge lives.

Table handles are cached per (session, sf_dir, name): ``spark.read.parquet``
eagerly lists files and reads parquet footers for schema inference on every
call (~120-175 ms per table on this host), so a query touching five tables
paid ~0.7 s of pure metadata overhead per invocation. A real deployment
resolves tables through a metastore whose schemas and file listings are
cached; reusing the analyzed DataFrame handle is the local equivalent. The
handle is a logical plan, not data — caching it never pins row data in
memory, and Spark's InMemoryFileIndex on the handle keeps the file listing.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcast-join these (SURVEY.md §5).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (applicationId, sf_dir, name) -> DataFrame handle. applicationId is unique
# per SparkSession lifetime, so a handle can never leak across sessions
# (a stopped session's plans are unusable in its successor).
_HANDLES: dict[tuple[str, str, str], DataFrame] = {}


def _ensure_utc(spark: SparkSession) -> None:
    """Pin the session time zone before ANY table is served. Every
    timestamp/date that crosses to Python (toPandas/collect) renders in the
    SESSION zone, and the NTZ cast in the events loader interprets
    wall-clock values in it — an externally-built default-config session on
    a non-UTC host would shift every instant and date vs the DuckDB oracle
    (which reads the parquet values as naive UTC). Applies to all tables
    and all parquet generations, not just the events NTZ branch."""
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
        # generations (Spark 4 refuses it by default; nanosAsLong reads it as
        # raw int64) and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others
        # (Spark reads TIMESTAMP_NTZ). Normalize BOTH to TimestampType at µs
        # precision — with the session timeZone pinned to UTC the NTZ cast is
        # wall-clock-identity, so every downstream query sees the same values
        # DuckDB does regardless of which generation is on disk (SURVEY §7.5).
        from pyspark.sql import functions as F

        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # nanos generation, via nanosAsLong
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if ts_type != "timestamp":  # timestamp_ntz generation
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_utc(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _HANDLES.get(key)
    if df is None:
        df = _load(spark, sf_dir, name)
        _HANDLES[key] = df
    return df


# Persisted-DataFrame memos (capped interactions, graph edge tables, rollup
# tiers, minhash signatures) previously grew without bound: a long-lived
# session touching many sf_dirs accumulated pinned storage with no unpersist
# point (r5 ADVICE). memo_persist centralizes the lifecycle: LRU-capped at
# MEMO_CAP entries per memo dict, evictees unpersist (non-blocking — an
# in-flight job holding the evicted handle still computes, just uncached).
# 4 covers the realistic working set (the three test SFs + one ad-hoc dir).
MEMO_CAP = 4


def memo_persist(
    memo: dict, key: tuple, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return memo[key], (re)persisted; build+persist+insert on miss.

    Re-persist on hit covers an external ``spark.catalog.clearCache()``
    having dropped the entry — the multi-branch fan-outs these memos feed
    must compute their building block once per action, not per branch.
    """
    cached = memo.get(key)
    if cached is not None:
        lvl = cached.storageLevel
        if not (lvl.useMemory or lvl.useDisk):
            cached.persist()
        memo.pop(key)
        memo[key] = cached  # refresh LRU position (dicts keep insert order)
        return cached
    df = build().persist()
    memo[key] = df
    while len(memo) > MEMO_CAP:
        evicted = memo.pop(next(iter(memo)))
        try:
            evicted.unpersist(blocking=False)
        except Exception:
            pass  # a stopped session's handle: nothing left to unpin
    return df


def spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin a low-parallelism source across the session's cores
    before CPU-heavy per-row work (r8 optimization, guide §1.2/§2.5).

    The test corpus ships as single-row-group parquet files, so every scan
    is ONE task — and chains whose cost scales with per-row compute or
    candidate fan-out (tokenize+md5 per doc, blocked joins with expensive
    verify predicates) inherit that single task: input-byte-based split
    sizing cannot see compute-bound stages. Measured: q_join_fuzzy ran 44 s
    of its 45 s CPU in one task; q_sim_setjoin_prefix spent ~60 s across
    six 1-task stages (plans/r08/).

    Scale-adaptive: when the scan already yields at least the session's
    parallelism (any real multi-file/multi-row-group table at cluster
    scale), this is the identity — no exchange is added, so the 100 TB plan
    is untouched. Row-deterministic downstream operators make the
    round-robin value-neutral: aggregates here are exact-integer or
    order-independent by the repo's determinism discipline."""
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """createOrReplaceTempView for every table (operator A5)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
