"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the same
parquet, then compares row count, column names/types, and the full
order-insensitive multiset of values (exact — stricter than any hash).

Usage:
    python tools/check_oracles.py [--sf /root/testdata/sf0.01] [--json out.json] [name ...]

--json writes a driver-CORRECTNESS-shaped report (rows_match / schema_match /
hash_match per query, "no_oracle" for rows-only queries) so each round's full
local sweep can be committed as CORRECTNESS_LOCAL_r{N}.json alongside the
driver's capped CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recsys_spark_spark.catalog import TABLES  # noqa: E402
from recsys_spark_spark.registry import load_all  # noqa: E402
from recsys_spark_spark.session import get_spark  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    _assert_cap_properties(con, sf_dir)
    return con


def _assert_cap_properties(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    """The capped CF paths (MAX_USER_HISTORY in capped_interactions /
    history_capped_edges, MAX_ITEM_AUDIENCE in audience_capped) are exact vs
    their UNCAPPED oracles only while no user/item in the data reaches the
    cap. The fixture SFs are guarded in tests/test_cf_property.py, but this
    harness accepts ANY --sf dir (ADVICE r7) — assert the property on the
    actual data under comparison so a hotter dataset fails loudly here
    instead of producing a confusing hash mismatch 40 queries in."""
    from recsys_spark_spark.cf.itemcf import MAX_ITEM_AUDIENCE, MAX_USER_HISTORY

    max_hist, max_aud = con.execute(
        """
        WITH ui AS (
          SELECT o_custkey AS u, l_partkey AS i
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1, 2
        )
        SELECT (SELECT MAX(c) FROM (SELECT COUNT(*) c FROM ui GROUP BY u)),
               (SELECT MAX(c) FROM (SELECT COUNT(*) c FROM ui GROUP BY i))
        """
    ).fetchone()
    if max_hist >= MAX_USER_HISTORY or max_aud >= MAX_ITEM_AUDIENCE:
        raise SystemExit(
            f"{sf_dir}: cap property violated (max user history {max_hist} vs "
            f"cap {MAX_USER_HISTORY}, max item audience {max_aud} vs cap "
            f"{MAX_ITEM_AUDIENCE}) — capped CF queries are not oracle-exact "
            "on this data"
        )


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows → comparable frame."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


# DuckDB output types the driver's typed hash cannot reconcile with Spark's:
# HUGEINT (int128, e.g. un-cast SUM(BIGINT)) and DECIMAL (e.g. un-cast
# SUM/AVG over DECIMAL) hash differently from Spark's int64/float64 even when
# every value is numerically equal. canonicalize() below widens all integer
# dtypes to Int64 and so MASKS this class of bug — check the declared DuckDB
# schema BEFORE normalization (this exact gap let q_catalog_managed_table go
# driver-red in round 3 while passing locally).
_BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def oracle_type_problems(con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """DESCRIBE the oracle and flag output types the driver hash can't match."""
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:  # DESCRIBE can fail on some statements; non-fatal
        return [f"DESCRIBE failed ({e}); cannot audit oracle output types"]
    out = []
    for col, typ, *_ in desc:
        if any(b in typ.upper() for b in _BANNED_DUCK_TYPES):
            out.append(
                f"oracle col {col!r} has DuckDB type {typ} — the driver's typed "
                f"hash will mismatch Spark even on equal values; CAST the "
                f"outer expression to BIGINT/DOUBLE in the oracle SQL"
            )
    return out


def bit_problems(s: pd.DataFrame, d: pd.DataFrame) -> list[str]:
    """IEEE-754 bit-level multiset compare of every float column.

    Round-6 lesson (q_feature_covariance): the driver hashes VALUE BYTES, so
    -0.0 (DuckDB ROUND(double) output for tiny negatives) vs +0.0 (Spark's
    long-typed rlong) is a driver red even though every value-level compare —
    including this tool's multiset pass — calls them equal. Equal non-NaN,
    non-zero doubles have equal bit patterns, so a per-column sorted-bits
    compare diverges from the value compare exactly on signed zeros and NaN
    payloads — the driver-only failure classes. Run on canonicalized frames.
    """
    out = []
    for c in s.columns:
        if not pd.api.types.is_float_dtype(s[c]):
            continue
        sb = np.sort(s[c].to_numpy(dtype=np.float64).view(np.uint64))
        db = np.sort(d[c].to_numpy(dtype=np.float64).view(np.uint64))
        if len(sb) == len(db) and not np.array_equal(sb, db):
            i = int(np.argmax(sb != db))
            out.append(
                f"col {c!r}: float BIT multisets differ (values may compare "
                f"equal — signed zero / NaN payload): first diff "
                f"spark_bits={sb[i]:016x} duck_bits={db[i]:016x}"
            )
    return out


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
    s, d = canonicalize(spark_df), canonicalize(duck_df)
    if len(s) == len(d):
        problems.extend(bit_problems(s, d))
        for c in s.columns:
            sv, dv = s[c], d[c]
            if pd.api.types.is_float_dtype(sv):
                eq = (sv.isna() & dv.isna()) | (sv == dv)
            else:
                eq = (sv.isna() & dv.isna()) | (sv == dv)
            bad = int((~eq.fillna(False)).sum())
            if bad:
                idx = (~eq.fillna(False)).idxmax()
                detail = f" e.g. row {idx}: spark={sv[idx]!r} duck={dv[idx]!r}"
                if pd.api.types.is_float_dtype(sv):
                    with np.errstate(invalid="ignore"):
                        md = float(np.nanmax(np.abs(sv.to_numpy(dtype=float) - dv.to_numpy(dtype=float))))
                    detail += f" maxdiff={md:g}"
                problems.append(f"col {c!r}: {bad} mismatching values;{detail}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument(
        "--verify-sweep",
        dest="verify_sweep",
        default=None,
        metavar="SWEEP_JSON",
        help="no queries run: exit 1 unless SWEEP_JSON covers every "
        "registered query (the r5 snapshot shipped a sweep 12 keys behind "
        "HEAD — run this against the committed CORRECTNESS_LOCAL file "
        "before every end-of-round snapshot)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    if args.verify_sweep:
        queries, _ = load_all()
        with open(args.verify_sweep) as f:
            swept = set(json.load(f))
        missing = sorted(set(queries) - swept)
        extra = sorted(swept - set(queries))
        if missing or extra:
            print(f"SWEEP INCOMPLETE vs registry ({len(queries)} keys):")
            if missing:
                print(f"  not in sweep ({len(missing)}): {missing}")
            if extra:
                print(f"  swept but unregistered ({len(extra)}): {extra}")
            return 1
        print(f"sweep covers all {len(queries)} registry keys")
        return 0
    if not os.path.isdir(args.sf):  # accept the "sf0.01" shorthand
        args.sf = os.path.join("/root/testdata", args.sf)

    queries, oracles = load_all()
    names = args.names or sorted(queries)
    spark = get_spark(shuffle_partitions=8)
    con = duck_connection(args.sf)

    failures = 0
    report: dict[str, dict] = {}
    for name in names:
        if name not in queries:
            print(f"FAIL {name}: not registered")
            failures += 1
            report[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                            "spark_rows": None, "oracle_rows": None, "err": "not_registered"}
            continue
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            failures += 1
            report[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                            "spark_rows": None, "oracle_rows": None, "err": "spark_raised"}
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            report[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                            "spark_rows": len(sdf), "oracle_rows": None, "err": "no_oracle"}
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: oracle raised\n{traceback.format_exc()}")
            failures += 1
            report[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                            "spark_rows": len(sdf), "oracle_rows": None, "err": "oracle_raised"}
            continue
        problems = oracle_type_problems(con, oracles[name]) + compare(name, sdf, ddf)
        schema_ok = not any(p.startswith("columns differ") for p in problems)
        rows_ok = len(sdf) == len(ddf)
        report[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                        "hash_match": not problems, "spark_rows": len(sdf),
                        "oracle_rows": len(ddf), "err": problems[0] if problems else None}
        if problems:
            failures += 1
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(sdf)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report written to {args.json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
