"""3.K — real Structured Streaming implementations.

Each function takes a *streaming* DataFrame with the events schema
(ts timestamp, event_id long, user_id long, event_type string, value double)
and returns the streaming result DataFrame. tests/test_streaming.py replays
the events parquet through a file-stream source and asserts each result
equals its registered batch twin (streaming/batch_twins.py) — that
equivalence is the correctness argument for the streaming path, since the
driver's oracle can only check batch.

Scale notes: all stateful ops are keyed by (window|user) → state is
partitioned across executors' state stores (RocksDB in production);
watermarks bound state size — without one, K1-K3 state grows forever.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recsys_spark_spark.functions.determinism import rlong
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

WATERMARK = "10 minutes"
SESSION_GAP = "30 minutes"


def stream_tumbling(events: DataFrame) -> DataFrame:
    """K1: tumbling 1h counts/sums with a 10-min watermark."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(rlong(F.col("value") * F.lit(1e6))) / F.lit(1e6)).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def stream_sliding(events: DataFrame) -> DataFrame:
    """K2: sliding 1h/15min counts."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def stream_session(events: DataFrame) -> DataFrame:
    """K3: session windows (30-min gap) per user."""
    sec = events.withColumn("sec", F.date_trunc("second", "ts"))
    return (
        sec.withWatermark("sec", WATERMARK)
        .groupBy(F.session_window("sec", SESSION_GAP).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("sec").alias("session_start"), F.max("sec").alias("last_sec"))
        .select(
            "user_id",
            "session_start",
            "n_events",
            (F.unix_timestamp("last_sec") - F.unix_timestamp("session_start")).alias("duration_s"),
        )
    )


def stream_dedup(events: DataFrame) -> DataFrame:
    """K5: drop duplicate event_ids within the watermark horizon."""
    return (
        events.withWatermark("ts", WATERMARK)
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- K6: arbitrary stateful op — consecutive-error run tracker ------------

_ANOMALY_SCHEMA = "user_id long, n_error_runs long, max_run_len long, n_anomalies long"
_ANOMALY_STATE = "runs long, max_run long, anomalies long, cur_run long"


def _anomaly_update(
    key: Tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update: fold ordered events into the per-user
    (runs, max_run, anomalies, current_run) counters.

    Correct under the test harness's single-batch replay; a production
    multi-batch deploy would also need event-time ordering within state
    (e.g. buffer + watermark flush) — noted, not needed for the equivalence
    test which feeds batches in order."""
    runs, max_run, anomalies, cur = (
        state.get if state.exists else (0, 0, 0, 0)
    )
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["sec", "event_id"])
        for is_err in pdf["is_err"]:
            if is_err:
                cur += 1
                if cur == 1:
                    runs += 1
                if cur > max_run:
                    max_run = cur
                if cur == 3:
                    anomalies += 1
            else:
                cur = 0
    state.update((runs, max_run, anomalies, cur))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_error_runs": [runs],
            "max_run_len": [max_run],
            "n_anomalies": [anomalies],
        }
    )


def stream_anomaly(events: DataFrame) -> DataFrame:
    """K6: per-user consecutive-error state machine via
    applyInPandasWithState — emits the running counters each batch."""
    ev = events.select(
        "user_id",
        "event_id",
        F.date_trunc("second", "ts").alias("sec"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _anomaly_update,
        outputStructType=_ANOMALY_SCHEMA,
        stateStructType=_ANOMALY_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_late_data_drop(events: DataFrame) -> DataFrame:
    """K4: watermark behavior surface — tumbling counts in APPEND mode, where
    a window only emits once the 10-min watermark passes its end, and rows
    later than the watermark are dropped. The test injects late rows and
    asserts they do not appear."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def stream_stream_join(events: DataFrame) -> DataFrame:
    """K7: stream-stream interval join — click events matched to error events
    of the same user within the following 5 minutes.

    Both sides carry a watermark and the join condition bounds the event-time
    distance, so each side's state store retains only the watermark+interval
    horizon (without the time constraint a stream-stream join's state grows
    forever). Inner join in append mode emits exactly the batch-join rows —
    the equivalence the pytest harness asserts."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", WATERMARK)
    )
    errors = (
        events.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("err_user"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", WATERMARK)
    )
    return clicks.join(
        errors,
        F.expr(
            "user_id = err_user AND "
            "error_ts >= click_ts AND error_ts < click_ts + INTERVAL 5 MINUTES"
        ),
    ).select("click_id", "error_id", "user_id", "click_ts", "error_ts")


# --- K6b: transformWithStateInPandas (Spark 4 stateful API) ----------------

_PROFILE_OUT = "user_id long, n_events long, sum_value double, last_event_s long"
_PROFILE_STATE = "n long, sv long, last_s long"


def tws_available() -> bool:
    """transformWithStateInPandas runs its state server over protobuf; the
    dependency ships with real Spark distributions but is absent in this
    container — gate the API behind the import so callers can fall back to
    the applyInPandasWithState twin (identical fold, older API)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _make_profile_processor():
    """Build the StatefulProcessor lazily: the class only exists on Spark 4,
    and constructing it at import time would couple module import to the
    streaming API version."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ProfileProcessor(StatefulProcessor):
        """Per-user (n_events, scaled value sum, last-seen second) counters in
        a single fixed-width ValueState tuple. The value sum folds the
        JVM-side pre-scaled longs (rlong(value*1e6) computed before the
        stateful op), so state stays exact/order-independent and matches the
        batch twin's scaled-integer aggregate bit-for-bit.

        CAVEAT (also noted in BASELINE.md): this branch cannot execute in
        this container — protobuf is absent, tws_available() is False — so
        the ValueState.get()/update tuple-shape assumptions here are code-
        reviewed but not exercised by any committed test run. Before claiming
        the tws path on a full Spark distro, run
        tests/test_streaming.py::test_profile_stateful_stream_equals_batch
        there (it auto-selects this processor when protobuf exists). The
        applyInPandasWithState twin below folds identically and IS covered."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("profile", _PROFILE_STATE)

        def handleInputRows(self, key, rows, timerValues):
            n, sv, last_s = self._state.get() if self._state.exists() else (0, 0, 0)
            for pdf in rows:
                n += len(pdf)
                sv += int(pdf["v_scaled"].sum())
                last_s = max(last_s, int(pdf["sec_s"].max()))
            self._state.update((n, sv, last_s))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [sv / 1e6],
                    "last_event_s": [last_s],
                }
            )

        def close(self) -> None:
            pass

    return ProfileProcessor()


def stream_profile(events: DataFrame) -> DataFrame:
    """K6b: per-user running profile via the Spark 4 transformWithState API —
    the successor of applyInPandasWithState (K6), with explicit typed state
    handles (ValueState) instead of a single opaque tuple. Requires the
    RocksDB state store provider (set in the test harness; the default at
    cluster scale)."""
    ev = events.select(
        "user_id",
        rlong(F.col("value") * F.lit(1e6)).cast("long").alias("v_scaled"),
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("sec_s"),
    )
    return ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_profile_processor(),
        outputStructType=_PROFILE_OUT,
        outputMode="Update",
        timeMode="None",
    )


def _profile_update(
    key: Tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState twin of ProfileProcessor — the identical fold
    over (n, scaled-sum, last-second), usable where protobuf (and thus
    transformWithStateInPandas) is unavailable."""
    n, sv, last_s = state.get if state.exists else (0, 0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        sv += int(pdf["v_scaled"].sum())
        last_s = max(last_s, int(pdf["sec_s"].max()))
    state.update((n, sv, last_s))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [sv / 1e6],
            "last_event_s": [last_s],
        }
    )


def stream_profile_applyinpandas(events: DataFrame) -> DataFrame:
    """K6b fallback twin: the same per-user profile fold through
    applyInPandasWithState (no protobuf requirement)."""
    ev = events.select(
        "user_id",
        rlong(F.col("value") * F.lit(1e6)).cast("long").alias("v_scaled"),
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("sec_s"),
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _profile_update,
        outputStructType=_PROFILE_OUT,
        stateStructType=_PROFILE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_enrich(events: DataFrame, customers: DataFrame) -> DataFrame:
    """K8: stream-static enrichment join + tumbling windowed aggregate.

    The static side is a plain batch DataFrame: Spark re-evaluates it per
    micro-batch (a dim table updated between triggers is picked up), the
    join itself keeps NO state-store state, and with the watermark only
    open windows stay in the aggregation state. Mirrors
    batch_twins.q_stream_enrich exactly (same rlong scaled-int sum), which
    the pytest harness asserts."""
    dim = customers.select("c_custkey", "c_mktsegment")
    return (
        events.withWatermark("ts", WATERMARK)
        .join(dim, events.user_id == dim.c_custkey)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(rlong(F.col("value") * F.lit(1e6))) / F.lit(1e6)).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "segment", "n", "sum_value")
    )


def stream_chained(events: DataFrame) -> DataFrame:
    """K9: chained stateful aggregations — 15-min tumbling counts feeding
    an hourly max/total, in ONE streaming query (append mode; Spark's
    multiple-stateful-operators support). The second groupBy windows over
    the FIRST stage's window column; each stage emits a 15-min/hourly row
    only once its watermark passes, so the test harness appends a
    far-future sentinel event that advances the watermark past every real
    window (the sentinel's own window stays in state, never emitted).
    Mirrors batch_twins.q_stream_chained exactly."""
    q = (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        q.groupBy(F.window(F.col("w"), "1 hour").alias("h"), "event_type")
        .agg(
            F.max("n").cast("long").alias("max_quarter_n"),
            F.sum("n").cast("long").alias("total_n"),
        )
        .select(F.col("h.start").alias("window_start"), "event_type", "max_quarter_n", "total_n")
    )


def stream_cms(events: DataFrame) -> DataFrame:
    """K-cms: incrementally maintained Count-Min sketch of user_id
    frequencies — state is the fixed d x w cell grid (bounded regardless
    of stream length), each micro-batch folds in by plain summation
    (sketch linearity). Mirrors batch_twins.q_stream_cms exactly."""
    from recsys_spark_spark.operators.aggregates import cms_cells

    return cms_cells(events.select(F.col("user_id").alias("item")))
