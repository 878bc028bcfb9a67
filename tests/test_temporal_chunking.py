"""Invariant tests for the round-3 temporal / training-data-layout operators.

The DuckDB oracles prove value parity; these prove the *semantics* against
independent reconstructions (pandas reference implementations) and the
structural invariants that must hold at any scale.
"""

from __future__ import annotations

import math

import pandas as pd

from recsys_spark_spark.registry import load_all
from tests.conftest import SF_SMOKE

QUERIES, _ = load_all()


def test_gapfill_spans_are_dense(spark):
    out = QUERIES["q_ts_gapfill"](spark, SF_SMOKE).toPandas()
    out["day"] = pd.to_datetime(out["day_str"])
    for _, g in out.groupby("user_id"):
        span_days = (g["day"].max() - g["day"].min()).days + 1
        assert len(g) == span_days, "gap-filled series has holes or dupes"
        assert g["day"].is_unique


def test_gapfill_preserves_event_totals(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    out = QUERIES["q_ts_gapfill"](spark, SF_SMOKE).toPandas()
    totals = out.groupby("user_id")["n_events"].sum()
    raw = ev.groupBy("user_id").count().toPandas().set_index("user_id")["count"]
    for uid, n in raw.items():
        assert totals[uid] == n


def test_scd2_matches_pandas_run_length_encoding(spark):
    out = QUERIES["q_scd2_events"](spark, SF_SMOKE).toPandas()
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "event_type", "ts", "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    # independent reference: run-length encode each user's type sequence
    expected_runs = 0
    for uid, g in ev.groupby("user_id"):
        runs = (g["event_type"] != g["event_type"].shift()).cumsum()
        expected_runs += runs.nunique()
        lengths = g.groupby(runs.values)["event_type"].count().to_list()
        got = (
            out[out["user_id"] == uid].sort_values("island")["n_events"].to_list()
        )
        assert got == lengths, f"user {uid} run lengths differ"
    assert len(out) == expected_runs


def test_scd2_intervals_are_ordered_and_disjoint(spark):
    out = QUERIES["q_scd2_events"](spark, SF_SMOKE).toPandas()
    for _, g in out.groupby("user_id"):
        g = g.sort_values("island")
        assert (g["valid_from_s"] <= g["valid_to_s"]).all()
        # consecutive islands never move backwards in time
        assert (g["valid_from_s"].diff().dropna() >= 0).all()


def test_cdc_diff_classification(spark):
    out = QUERIES["q_cdc_diff"](spark, SF_SMOKE).toPandas()
    keys = out["o_orderkey"]
    ins = out[out["change_type"] == "insert"]["o_orderkey"]
    dele = out[out["change_type"] == "delete"]["o_orderkey"]
    upd = out[out["change_type"] == "update"]["o_orderkey"]
    # inserts exist only in the new snapshot: key ≡0 (mod 10) and ∉ old, present in new
    assert (ins % 10 == 0).all() and (ins % 7 != 0).all()
    # deletes exist only in the old snapshot
    assert (dele % 7 == 0).all() and (dele % 10 != 0).all()
    # updates are the mod-5 rewrite rows present in both snapshots
    assert (upd % 5 == 0).all() and (upd % 10 != 0).all() and (upd % 7 != 0).all()
    assert keys.is_unique
    # every update row changed at least one field (row-wise OR)
    both = out[out["change_type"] == "update"]
    assert (
        (both["old_status"] != both["new_status"])
        | (both["old_total"] != both["new_total"])
    ).all()


def test_chunking_covers_every_document_exactly(spark):
    from recsys_spark_spark.llm.chunking import CHUNK_CHARS, CHUNK_STRIDE

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "n_chars")
        .toPandas()
        .set_index("doc_id")["n_chars"]
    )
    out = QUERIES["q_chunk_fixed"](spark, SF_SMOKE).toPandas()
    for doc_id, g in out.groupby("doc_id"):
        n = docs[doc_id]
        assert len(g) == math.ceil(n / CHUNK_STRIDE)
        g = g.sort_values("chunk_idx")
        assert (g["start"] == g["chunk_idx"] * CHUNK_STRIDE).all()
        # every chunk is full-width except possibly the tail ones
        assert (g["chunk_len"] == g.apply(
            lambda r: min(CHUNK_CHARS, n - r["start"]), axis=1
        )).all()
        # overlap: consecutive starts differ by stride < width → no coverage gap
        assert CHUNK_STRIDE <= CHUNK_CHARS


def test_packing_offsets_are_contiguous_per_bucket(spark):
    from recsys_spark_spark.llm.chunking import PACK_BUDGET

    out = QUERIES["q_pack_sequences"](spark, SF_SMOKE).toPandas()
    for _, g in out.groupby("bucket"):
        g = g.sort_values("doc_id")
        # offsets tile the stream: each doc starts where the previous ended
        expected = g["n_tok"].cumsum().shift(fill_value=0)
        assert (g["start_tok"].values == expected.values).all()
        assert (g["seq_id"] == g["start_tok"] // PACK_BUDGET).all()
        assert g["seq_id"].is_monotonic_increasing


def test_ffill_matches_pandas_groupby_ffill(spark):
    out = QUERIES["q_ts_ffill"](spark, SF_SMOKE).toPandas()
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .selectExpr(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            "CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v",
        )
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["want"] = ev.groupby("user_id")["v"].ffill()
    merged = out.merge(ev[["event_id", "want"]], on="event_id")
    both_nan = merged["val_ffill"].isna() & merged["want"].isna()
    assert (both_nan | (merged["val_ffill"] == merged["want"])).all()


def test_rollup_cascade_is_exactly_mergeable(spark):
    """The cascade's defining property: day tier built from hour partials
    (which were built from minute partials) must equal aggregating events
    directly to days — exactly, because partials are scaled-int longs."""
    from pyspark.sql import functions as F

    from recsys_spark_spark.functions.determinism import rlong

    out = QUERIES["q_ts_rollup_cascade"](spark, SF_SMOKE).toPandas()
    day = out[out["resolution"] == "day"].set_index("bucket").sort_index()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    # catalog.table handles ts dtype; go through the registered query's input
    from recsys_spark_spark.catalog import table

    direct = (
        table(spark, SF_SMOKE, "events")
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(rlong(F.col("value") * F.lit(1e6))) / F.lit(1e6)).alias("sum_value"),
        )
        .toPandas()
        .set_index("bucket")
        .sort_index()
    )
    assert (day["n"] == direct["n"]).all()
    assert (day["sum_value"] == direct["sum_value"]).all()  # bit-exact, not approx
    # tier row counts: every minute belongs to exactly one hour and day
    assert len(out[out["resolution"] == "minute"]) >= len(out[out["resolution"] == "hour"]) >= len(day)


def test_quantization_error_bounded_by_half_step(spark):
    out = QUERIES["q_embed_quantize"](spark, SF_SMOKE).toPandas()
    # |x - round(x/s)*s| ≤ s/2 per dim, so the mean is too (+1e-6 rounding slack)
    assert (out["mean_abs_err"] <= out["q_scale_r"] / 2 + 1e-6).all()
    assert (out["mean_abs_err"] >= 0).all()
    assert (out["q_scale_r"] > 0).all()
