"""Mergeable-sketch contract: per-month HLL partials unioned per priority
must estimate EXACTLY what the direct one-pass sketch estimates (HLL state is
a per-register max — order/partitioning independent), and both must land
within the sketch's error envelope of the exact distinct count."""

from __future__ import annotations

from recsys_spark_spark.registry import load_all
from tests.conftest import SF_SMOKE

QUERIES, _ = load_all()


def test_hll_union_of_partials_equals_direct_sketch(spark):
    rows = QUERIES["q_hll_mergeable"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.merged_estimate == r.direct_estimate, r
        # lgConfigK default 12 -> RSE ~1.6%; allow 5% at tiny cardinalities
        assert abs(r.direct_estimate - r.exact_distinct) <= max(
            3, 0.05 * r.exact_distinct
        ), r
