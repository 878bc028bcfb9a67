"""Audit latent cross-engine rounding boundaries (BASELINE.md round-6 item).

Context: Spark's ``F.round(x, s)`` rounds the exact decimal expansion of the
double (BigDecimal HALF_UP) while DuckDB's ``ROUND(x, s)`` computes
``round(x * 10^s) / 10^s`` in doubles — the multiply form. The two agree
except when ``x * 10^s`` lands within a float-error of ``k + 0.5``; then the
7th decimal can flip differently per engine (observed on q_ts_ewma at sf0.1,
7 of 150k rows, BASELINE.md). New queries use the matched dround/oround
multiply-form pair; older queries still use the plain pair and are
driver-green, but their safety is DATA-dependent. This tool measures, per
oracled query, how close every double output comes to a rounding boundary —
converting "probably fine" into a number.

For each double column of each oracle result (DuckDB side — cheap, no JVM):
  margin(x) = |frac(|x| * 1e6) - 0.5|   (distance of the scaled value from
              the half boundary, in units of the 6th decimal)
A margin near 0 means that row sits on the knife edge where the plain pair
may disagree. Rows with margin < --threshold (default 1e-9, ~the double
noise floor at these magnitudes) are flagged.

Usage: python tools/rounding_audit.py [--sf DIR] [--threshold T] [--json OUT]
Exit code 1 if any flagged rows exist in queries using the PLAIN pair
(queries already on the multiply-form pair are reported but exempt — both
engines compute the identical multiply there by construction).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Heuristic: a query whose oracle contains the multiply-form idiom
# "ROUND(<expr> * 1e6, 0) / 1e6" (or any 1eS scale) uses the matched pair.
_MULTIPLY_FORM = re.compile(r"ROUND\([^;]*?\*\s*1e\d+\s*,\s*0\s*\)\s*/\s*1e\d+")


def margins(values, scale: float = 1e6):
    for v in values:
        if v is None or not isinstance(v, float) or math.isnan(v) or math.isinf(v):
            continue
        scaled = abs(v) * scale
        if scaled > 2**52:  # beyond this doubles have no fractional part
            continue
        yield abs((scaled % 1.0) - 0.5)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--threshold", type=float, default=1e-9)
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    from recsys_spark_spark.registry import load_all

    _, oracles = load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    report: dict = {"sf": args.sf, "threshold": args.threshold, "queries": {}}
    plain_flagged = 0
    for name, sql in sorted(oracles.items()):
        pair = "multiply" if _MULTIPLY_FORM.search(sql) else "plain"
        try:
            df = con.execute(sql).fetchdf()
        except Exception as exc:  # oracle must run; sweeps guarantee it
            report["queries"][name] = {"error": str(exc)[:200]}
            continue
        worst, n_flagged, n_doubles = None, 0, 0
        for col in df.columns:
            if df[col].dtype.kind != "f":
                continue
            for m in margins(df[col].tolist()):
                n_doubles += 1
                if worst is None or m < worst:
                    worst = m
                if m < args.threshold:
                    n_flagged += 1
        entry = {
            "pair": pair,
            "double_values": n_doubles,
            "min_margin": worst,
            "flagged": n_flagged,
        }
        report["queries"][name] = entry
        if n_flagged and pair == "plain":
            plain_flagged += 1
            print(f"FLAG {name}: {n_flagged} values within {args.threshold} "
                  f"of a half boundary (min margin {worst:.2e}, plain pair)")

    at_risk = sorted(
        (
            (e["min_margin"], n)
            for n, e in report["queries"].items()
            if e.get("pair") == "plain" and e.get("min_margin") is not None
        )
    )[:10]
    print(f"\n{len(report['queries'])} oracles audited; "
          f"{plain_flagged} plain-pair queries flagged at threshold {args.threshold}")
    print("closest plain-pair margins:",
          [(n, f"{m:.2e}") for m, n in at_risk])
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1, default=float)
        print("written", args.json_out)
    return 1 if plain_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
