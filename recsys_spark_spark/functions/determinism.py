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


def rlong(col: Column) -> Column:
    """Round a double expression half-away-from-zero to a long — the fast twin
    of ``F.round(col, 0).cast("long")`` and of DuckDB's ``ROUND(x, 0)``.

    ``F.round`` routes every row through a BigDecimal allocation (~160 ns/row
    plus GC pressure — measured multi-second inflation and GC-driven variance
    on the 25M-row CF similarity stream); ``floor(v+0.5)`` / ``ceil(v-0.5)``
    stays in whole-stage-codegen primitive ops. Exactly equal to both rounders
    for |v| < 2^51 except doubles whose exact value ties halfway between two
    representables after the ±0.5 add (measure-zero; verified absent on all
    oracle-checked data, tools/check_oracles.py).
    """
    return F.when(col < 0, F.ceil(col - F.lit(0.5))).otherwise(
        F.floor(col + F.lit(0.5))
    )


def dround(col: Column, scale: int = 6) -> Column:
    """Fast multiply-form decimal rounding: round(x*10^s)/10^s as primitive
    double/long ops. NOT digit-exact ``F.round(x, s)`` (which rounds the exact
    decimal expansion); its DuckDB twin is :func:`oround`, and both sides must
    use the pair. Use where rounding runs per-row on fact-scale data (CF
    similarity); output-sized columns can keep ``F.round``."""
    factor = F.lit(float(10**scale))
    return rlong(col * factor) / factor


def oround(expr: str, scale: int = 6) -> str:
    """DuckDB SQL twin of :func:`dround` (multiply-form rounding)."""
    return f"(ROUND(({expr}) * 1e{scale}, 0) / 1e{scale})"


def dsum(col: Column, scale: int = 6) -> Column:
    """Order-independent SUM of a double expression, exact to `scale` decimals.

    Safe while sum(|x|) * 10^scale < 2^63 (and < 2^53 for exact float
    round-trip of the final division) — holds for every workload here.
    """
    factor = float(10**scale)
    scaled = rlong(col * F.lit(factor))
    return F.sum(scaled) / F.lit(factor)


def osum(expr: str, scale: int = 6) -> str:
    """DuckDB SQL twin of :func:`dsum`. Cast keeps HUGEINT out of the schema."""
    factor = f"1e{scale}"
    return f"(SUM(CAST(ROUND(({expr}) * {factor}, 0) AS BIGINT)) / {factor})"


def davg(col: Column, scale: int = 6) -> Column:
    """Order-independent AVG of a double expression."""
    factor = float(10**scale)
    scaled = rlong(col * F.lit(factor))
    return F.sum(scaled) / (F.count(scaled) * F.lit(factor))


def oavg(expr: str, scale: int = 6) -> str:
    """DuckDB SQL twin of :func:`davg`."""
    factor = f"1e{scale}"
    scaled = f"CAST(ROUND(({expr}) * {factor}, 0) AS BIGINT)"
    return f"(SUM({scaled}) / (COUNT({scaled}) * {factor}))"
