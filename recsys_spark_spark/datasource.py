"""Spark 4 Python DataSource API — the extension surface for custom
connectors, exercised with a deterministic synthetic-events generator.

A real deployment plugs message buses, internal formats, or REST-paged APIs
in exactly this shape: a DataSource declares a schema, its reader splits the
read into InputPartitions (the parallelism contract — each partition is
generated independently on an executor, no driver materialization), and each
partition yields plain tuples. The generator here is pure integer arithmetic
on the row index, so the DuckDB oracle reproduces it exactly with
generate_series — proving the connector path end-to-end (registration,
option passing, partition planning, per-partition iteration) with an exact
value check rather than a smoke test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from recsys_spark_spark.functions.determinism import rlong
from recsys_spark_spark.registry import query

PYDS_ROWS = 5000
PYDS_PARTITIONS = 8
_KINDS = ("view", "click", "purchase", "refund")


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", PYDS_ROWS))
        self.p = int(options.get("partitions", PYDS_PARTITIONS))

    def partitions(self):
        step = max(1, -(-self.n // self.p))  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.lo, partition.hi):
            yield (
                i,
                i % 97,
                _KINDS[i % len(_KINDS)],
                (i * 31 % 1000) / 10.0,
            )


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events").option("n", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, kind string, amount double"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


@query(
    "q_source_python_ds",
    oracle=f"""
WITH gen AS (
  SELECT gs.i AS event_id, gs.i % 97 AS user_id,
         ['view', 'click', 'purchase', 'refund'][(gs.i % 4) + 1] AS kind,
         (gs.i * 31 % 1000) / 10.0 AS amount
  FROM generate_series(0, {PYDS_ROWS - 1}) gs(i)
)
SELECT kind, COUNT(*) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(ROUND(amount * 100, 0) AS BIGINT)) AS BIGINT) AS cents
FROM gen GROUP BY 1
""",
)
def q_source_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: custom connector via the Spark 4 Python DataSource API — the
    synthetic-events source registered, read with options, and aggregated.
    The read is planned as PYDS_PARTITIONS independent InputPartitions
    (generation happens per-executor under Arrow batching, nothing flows
    through the driver), which is the scalability contract any real custom
    connector must honor. Values are index arithmetic, so the oracle
    regenerates the identical rows with generate_series.

    sf_dir is unused by design: the source IS the data."""
    spark.dataSource.register(SyntheticEventsDataSource)  # re-register is a no-op overwrite
    df = (
        spark.read.format("synthetic_events")
        .option("n", str(PYDS_ROWS))
        .option("partitions", str(PYDS_PARTITIONS))
        .load()
    )
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(rlong(F.col("amount") * 100)).cast("long").alias("cents"),
    )
