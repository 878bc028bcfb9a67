"""Extended benchmark — the heavy non-headline tail (VERDICT r5 item 8).

bench.py's headline set keeps the driver number readable, but 240+ registry
entries never get timed round-over-round, so a perf regression in the heavy
tail (e.g. the r5 eigencentrality decimal hot loop, 104 s) is invisible
until a judge probe finds it. This tool times the most expensive
non-headline queries at $SPARK_GRAFT_SF_DIR with bench.py's exact noise
discipline (warm prime through the same code path, interleaved rounds, MIN
over samples — additive-noise model, BASELINE.md "M7 measured") and writes
BENCH_EXTENDED_r{N}.json for round-over-round comparison.

Usage: python tools/bench_extended.py [--json OUT] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recsys_spark_spark.registry import load_all  # noqa: E402
from recsys_spark_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The heavy tail: the most expensive registry entries outside bench.py's
# HEADLINE set, one per distinct cost center (graph self-joins, iterative
# power methods, banded candidate joins, interval/range joins, full-ECDF
# stats, multi-builder composition, survival curves, incremental maintenance,
# per-pair CF deviations, changepoint windows).
EXTENDED = (
    "q_cf_slope_one",
    "q_graph_jaccard",
    "q_cf_incremental_cooc",
    "q_graph_pagerank",
    "q_graph_eigencentrality",
    "q_dedup_minhash_exact",
    "q_join_interval",
    "q_stat_ks",
    "q_feature_store",
    "q_survival_km",
    "q_ts_changepoint",
    # round-6 continuation: the checkpointed iterative chains (BPE merge
    # stages, star contraction, BFS frontiers), the prefix-filtered
    # similarity self-join, and the capped user-pair Swing joins
    "q_text_bpe_train",
    "q_text_bpe_encode",
    "q_graph_components",
    "q_graph_khop",
    "q_sim_setjoin_prefix",
    "q_cf_swing",
)


def run_one(spark, fn, sf_dir: str) -> float:
    # Same discipline as bench.py.run_one: clearCache so every run recomputes
    # from parquet (the memoized edge/matrix builders re-persist on access
    # but their data is gone), toPandas for the Arrow materialization path.
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, sf_dir).toPandas()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    queries, _ = load_all()
    spark = get_spark(app_name="recsys-spark-bench-extended")
    spark.sparkContext.setLogLevel("ERROR")

    for name in EXTENDED:  # untimed warm prime, same code path
        run_one(spark, queries[name], SF_DIR)

    samples: dict[str, list[float]] = {name: [] for name in EXTENDED}
    for _ in range(args.runs):  # interleaved rounds (noise lands on one round)
        for name in EXTENDED:
            samples[name].append(run_one(spark, queries[name], SF_DIR))

    timings = {name: round(min(s), 3) for name, s in samples.items()}
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "extended_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "runs": args.runs,
    }
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
