"""Fast-round equivalence guards — rlong/dround vs the engines they mimic.

rlong's floor/ceil form must stay bit-identical to F.round(v,0) (BigDecimal
HALF_UP) and DuckDB ROUND(v,0) on the magnitudes the queries produce; a
divergence here silently breaks every scaled-integer oracle at once.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from recsys_spark_spark.functions.determinism import dround, rlong


def _values() -> list[float]:
    # deterministic pseudorandom (no test-order dependence) + boundary cases
    vals = []
    x = 123456789.0
    for _ in range(50_000):
        x = (x * 1103515245.0 + 12345.0) % 2147483648.0
        vals.append((x - 1073741824.0) * 1e3)  # ~±1e12, within the 2^51 bound
        vals.append((x / 2147483648.0) - 0.5)  # small magnitudes
    vals += [i / 2.0 for i in range(-100, 100)]  # exact .5 ties
    vals += [2.4999999999999996, -2.4999999999999996, 1e12 + 0.5, -(1e12 + 0.5)]
    return vals


def test_rlong_matches_spark_round(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": _values()}))
    bad = (
        df.select(
            F.round("v", 0).cast("long").alias("a"), rlong(F.col("v")).cast("long").alias("b")
        )
        .where("NOT (a <=> b)")
        .count()
    )
    assert bad == 0


def test_rlong_matches_duckdb_round(spark):
    vals = _values()
    pdf = pd.DataFrame({"v": vals})
    duck = duckdb.connect().execute("SELECT CAST(ROUND(v, 0) AS BIGINT) a FROM pdf").df()
    got = (
        spark.createDataFrame(pdf)
        .select(rlong(F.col("v")).cast("long").alias("b"))
        .toPandas()
    )
    assert (duck["a"].values == got["b"].values).all()


def test_dround_matches_oround_in_duckdb(spark):
    """dround(x, 6) must equal its oracle twin oround: ROUND(x*1e6,0)/1e6."""
    vals = [v / 1e7 for v in _values()[:50_000]]
    pdf = pd.DataFrame({"v": vals})
    duck = duckdb.connect().execute("SELECT (ROUND(v * 1e6, 0) / 1e6) a FROM pdf").df()
    got = spark.createDataFrame(pdf).select(dround(F.col("v")).alias("b")).toPandas()
    assert (duck["a"].values == got["b"].values).all()
