"""Order-independent float aggregation helpers.

Summing doubles is order-dependent; Spark's partial aggregation order differs
from DuckDB's, so a plain SUM(double) hash-mismatches the oracle in the low
bits. Fix: round each term to a fixed decimal scale, sum as 64-bit integers
(exact, associative, order-independent), divide back. Used on BOTH sides —
Spark via these helpers, DuckDB via the matching SQL fragment — so results are
bit-identical. Also partition-count-independent, i.e. stable from local[32] to
a 1000-executor cluster (SURVEY.md §7.5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column, scale: int = 6) -> Column:
    """Order-independent SUM of a double expression, exact to `scale` decimals.

    Safe while sum(|x|) * 10^scale < 2^63 (and < 2^53 for exact float
    round-trip of the final division) — holds for every workload here.
    """
    factor = float(10**scale)
    scaled = F.round(col * factor, 0).cast("long")
    return F.sum(scaled) / F.lit(factor)


def osum(expr: str, scale: int = 6) -> str:
    """DuckDB SQL twin of :func:`dsum`. Cast keeps HUGEINT out of the schema."""
    factor = f"1e{scale}"
    return f"(SUM(CAST(ROUND(({expr}) * {factor}, 0) AS BIGINT)) / {factor})"


def davg(col: Column, scale: int = 6) -> Column:
    """Order-independent AVG of a double expression."""
    factor = float(10**scale)
    scaled = F.round(col * factor, 0).cast("long")
    return F.sum(scaled) / (F.count(scaled) * F.lit(factor))


def oavg(expr: str, scale: int = 6) -> str:
    """DuckDB SQL twin of :func:`davg`."""
    factor = f"1e{scale}"
    scaled = f"CAST(ROUND(({expr}) * {factor}, 0) AS BIGINT)"
    return f"(SUM({scaled}) / (COUNT({scaled}) * {factor}))"
