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

Usage: python tools/rounding_audit.py [--sf DIR ...] [--threshold T] [--json OUT]
``--sf`` may repeat — round 7 runs it at BOTH sf0.01 (the driver's gate SF,
where the r6 red row appeared) and sf0.1, since boundary geometry is
data-dependent (VERDICT r6 item 5).

The report also carries a CLOSED-FORM INVENTORY: for every oracle, the
rounded output expressions whose argument chains multiple double operations
(sqrt/div/mul/sub/exp/ln) — the q_feature_covariance incident's class, where
a last-ulp engine difference lands directly in the displayed value. Each
such column is a candidate for migration to the exact-integer/pre-quantized
discipline on a schedule. (Detection is regex-level: it inspects the
ROUND(...) argument text, not a parsed AST — a migration worklist, not a
proof.)

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


# closed-form detector: every ROUND( arg [, s] ) call site, argument captured
# up to the matching paren (regex-balanced to 2 nesting levels — enough for
# the registry's oracle idioms)
_ROUND_CALL = re.compile(r"ROUND\s*\(", re.I)
_FLOAT_OPS = re.compile(r"sqrt\s*\(|exp\s*\(|ln\s*\(|log\s*\(|/|\*|-|\+", re.I)
_AS_ALIAS = re.compile(r"^\s*(?:/\s*1e\d+\s*)?(?:AS\s+(\w+))?", re.I)


def _round_args(sql: str):
    """Yield (argument_text, alias_or_None) for each ROUND( call in sql."""
    for m in _ROUND_CALL.finditer(sql):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        arg = sql[m.end() : i - 1]
        alias = None
        am = _AS_ALIAS.match(sql[i:])
        if am:
            alias = am.group(1)
        yield arg, alias


def closed_forms(sql: str) -> list[dict]:
    """Rounded outputs whose argument runs >= 2 double ops beyond the display
    scaling — the multi-op closed forms a 1-ulp engine difference can flip."""
    out = []
    for arg, alias in _round_args(sql):
        # strip the display-scale multiply (the matched-pair idiom itself)
        body = re.sub(r"\*\s*1e\d+\s*$", "", arg.strip())
        # integer-cast arguments are exact by construction
        if re.match(r"^\s*CAST\s*\(", body, re.I) and re.search(
            r"AS\s+(HUGE|BIG)INT", body, re.I
        ):
            continue
        ops = _FLOAT_OPS.findall(body)
        # weight transcendental/sqrt and division as the risky ops
        risky = [o for o in ops if o.strip("( ").lower() in ("sqrt", "exp", "ln", "log", "/")]
        if len(ops) >= 2 and risky:
            out.append(
                {
                    "column": alias,
                    "ops": len(ops),
                    "risky_ops": len(risky),
                    "expr_head": " ".join(body.split())[:120],
                }
            )
    return out


def margins(values, scale: float = 1e6):
    for v in values:
        if v is None or not isinstance(v, float) or math.isnan(v) or math.isinf(v):
            continue
        scaled = abs(v) * scale
        if scaled > 2**52:  # beyond this doubles have no fractional part
            continue
        yield abs((scaled % 1.0) - 0.5)


def audit_sf(oracles: dict[str, str], sf: str, threshold: float) -> tuple[dict, int]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    queries: dict = {}
    plain_flagged = 0
    for name, sql in sorted(oracles.items()):
        pair = "multiply" if _MULTIPLY_FORM.search(sql) else "plain"
        try:
            df = con.execute(sql).fetchdf()
        except Exception as exc:  # oracle must run; sweeps guarantee it
            queries[name] = {"error": str(exc)[:200]}
            continue
        worst, n_flagged, n_doubles = None, 0, 0
        for col in df.columns:
            if df[col].dtype.kind != "f":
                continue
            for m in margins(df[col].tolist()):
                n_doubles += 1
                if worst is None or m < worst:
                    worst = m
                if m < threshold:
                    n_flagged += 1
        queries[name] = {
            "pair": pair,
            "double_values": n_doubles,
            "min_margin": worst,
            "flagged": n_flagged,
        }
        if n_flagged and pair == "plain":
            plain_flagged += 1
            print(f"FLAG {name} @ {sf}: {n_flagged} values within {threshold} "
                  f"of a half boundary (min margin {worst:.2e}, plain pair)")
    con.close()
    return queries, plain_flagged


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", action="append", default=None,
        help="repeatable; default: sf0.01 AND sf0.1",
    )
    ap.add_argument("--threshold", type=float, default=1e-9)
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()
    sfs = args.sf or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    from recsys_spark_spark.registry import load_all

    _, oracles = load_all()

    inventory = {
        name: forms
        for name, sql in sorted(oracles.items())
        if (forms := closed_forms(sql))
    }
    report: dict = {
        "threshold": args.threshold,
        "sfs": {},
        "closed_forms": inventory,
    }
    total_flagged = 0
    for sf in sfs:
        queries, plain_flagged = audit_sf(oracles, sf, args.threshold)
        report["sfs"][sf] = queries
        total_flagged += plain_flagged
        at_risk = sorted(
            (
                (e["min_margin"], n)
                for n, e in queries.items()
                if e.get("pair") == "plain" and e.get("min_margin") is not None
            )
        )[:10]
        print(f"\n{sf}: {len(queries)} oracles audited; "
              f"{plain_flagged} plain-pair queries flagged at threshold "
              f"{args.threshold}")
        print("closest plain-pair margins:",
              [(n, f"{m:.2e}") for m, n in at_risk])
    n_cols = sum(len(v) for v in inventory.values())
    print(f"\nclosed-form inventory: {len(inventory)} oracles carry {n_cols} "
          f"rounded multi-op double outputs (migration worklist)")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1, default=float)
        print("written", args.json_out)
    return 1 if total_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
