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


def test_agg_approx_within_tolerance_of_exact(spark):
    """q_agg_approx is rows-only for the driver (estimator-specific values);
    this is its accuracy gate: HLL++ at rsd=0.02 must land within 5% of the
    exact per-group distinct, and every approximate quartile must be an
    actually-occurring value inside the group's min/max and correctly
    ordered (percentile_approx returns a real sample at accuracy=10000)."""
    from pyspark.sql import functions as F

    from recsys_spark_spark.catalog import table

    for sf_dir in (SF_SMOKE, "/root/testdata/sf0.01"):
        approx = {
            r.o_orderpriority: r
            for r in QUERIES["q_agg_approx"](spark, sf_dir).collect()
        }
        exact = {
            r.o_orderpriority: r
            for r in table(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(
                F.countDistinct("o_custkey").alias("n_buyers"),
                F.min("o_totalprice").alias("lo"),
                F.max("o_totalprice").alias("hi"),
                F.expr("percentile(o_totalprice, 0.5)").alias("true_median"),
            )
            .collect()
        }
        assert set(approx) == set(exact)
        for k, a in approx.items():
            e = exact[k]
            assert abs(a.approx_buyers - e.n_buyers) <= max(
                3, 0.05 * e.n_buyers
            ), (sf_dir, k, a.approx_buyers, e.n_buyers)
            assert e.lo <= a.p25 <= a.p50 <= a.p75 <= e.hi, (sf_dir, k, a)
            # at accuracy=10000 the p50 estimate should hug the true median
            assert abs(a.p50 - e.true_median) <= max(
                1.0, 0.05 * abs(e.true_median)
            ), (sf_dir, k, a.p50, e.true_median)
