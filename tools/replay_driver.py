"""Driver-window replay — mechanize the "would the driver's gate pass?"
check the builder previously ran by hand (VERDICT round 4 #7).

Reproduces the driver's harshest conditions, all of which have bitten at
least once:

- **cold import**: `__spark_entry__` imported in THIS fresh process, no
  warm registry, no memoized handles;
- **default-config session**: `SparkSession.builder.getOrCreate()` with NO
  tuned confs — 200 shuffle partitions, no UTC pin, default AQE — so any
  partition-count- or timezone-dependent result diverges here, not in the
  driver;
- **non-UTC host timezone**: TZ=Asia/Tokyo is set before any JVM/pyspark
  import (re-exec if the parent already imported with another TZ);
- **window order**: the first N (default 50) `queries()` entries in
  registration order — exactly the slice the driver verifies;
- **oracle compare**: exact sorted-column multiset equality against the
  DuckDB `oracle_sql()` result (STRICTER than the driver's value hash);
  entries without an oracle get the driver's weaker rows-only check.

Usage:
    python tools/replay_driver.py [--sf /root/testdata/sf0.01]
                                  [--n 50] [--json REPLAY_r05.json]
Exit code = number of failing entries.

Ops note (observed 2026-08-14): run this on a QUIET machine, not
back-to-back with another local[*] JVM in the same shell chain. A replay
chained directly after a full check_oracles sweep lost its SparkContext
mid-run (task failures cascading into "Cannot call methods on a stopped
SparkContext", 22/50) while the identical standalone rerun passed 50/50 —
the default-config session has a small driver heap and the just-exited
sweep JVM's memory had not been reclaimed. A mid-run cascade of
INTERNAL_ERROR/stopped-context failures means rerun standalone, not a
query regression.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# TZ must be pinned before the JVM starts; re-exec if something already set
# a different zone into this interpreter's environment. Default Asia/Tokyo
# (UTC+9, no DST); REPLAY_TZ overrides so a second pass can cover the
# negative-offset + DST direction (r8: America/New_York) — a query that
# leaks the session zone shifts instants by different amounts under the two.
_REPLAY_TZ = os.environ.get("REPLAY_TZ", "Asia/Tokyo")
if os.environ.get("TZ") != _REPLAY_TZ:
    os.environ["TZ"] = _REPLAY_TZ
    os.execv(sys.executable, [sys.executable] + sys.argv)
time.tzset()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_dates(df):
    """Align DATE representations before the pandas compare: a default
    (no-Arrow) Spark session returns DateType as object-dtype
    datetime.date while DuckDB's fetchdf returns datetime64 — equal values
    that assert_frame_equal rejects on dtype kind alone (the driver's own
    typed hash accepts them: q_date_funcs/q_cast_coalesce went green in
    r4 windows with DATE outputs). Both sides become datetime64[us]."""
    import datetime as _dt

    import pandas as pd

    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif (
            s.dtype == object
            and s.notna().any()
            and s.map(
                lambda v: v is None or isinstance(v, (_dt.date, _dt.datetime))
            ).all()
        ):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
    return df


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod  # cold import, registration order

    spark = SparkSession.builder.master("local[*]").getOrCreate()  # DEFAULT confs
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    window = list(queries)[: args.n]
    report: dict[str, dict] = {}
    n_fail = 0
    for name in window:
        t0 = time.time()
        row: dict = {"ok": False, "err": None, "mode": None}
        try:
            sdf = queries[name](spark, args.sf).toPandas()
            if name in oracles:
                row["mode"] = "oracle"
                odf = con.execute(oracles[name]).df()
                cols = sorted(sdf.columns)
                if cols != sorted(odf.columns):
                    row["err"] = f"schema {cols} != {sorted(odf.columns)}"
                elif len(sdf) != len(odf):
                    row["err"] = f"rows {len(sdf)} != {len(odf)}"
                else:
                    a = _norm_dates(sdf[cols].sort_values(cols).reset_index(drop=True))
                    b = _norm_dates(odf[cols].sort_values(cols).reset_index(drop=True))
                    try:
                        pd.testing.assert_frame_equal(a, b, check_dtype=False)
                        row["ok"] = True
                    except AssertionError as ex:
                        row["err"] = str(ex).splitlines()[0][:300]
                    if row["ok"]:
                        # r6 lesson: assert_frame_equal is approximate for
                        # floats (rtol 1e-5) and signed-zero-blind, while the
                        # driver hashes value BYTES. Require the IEEE bit
                        # multiset of every float column to match too.
                        import numpy as np

                        for c in cols:
                            if not pd.api.types.is_float_dtype(a[c]):
                                continue
                            sb = np.sort(a[c].to_numpy(np.float64).view(np.uint64))
                            db = np.sort(b[c].to_numpy(np.float64).view(np.uint64))
                            if not np.array_equal(sb, db):
                                row["ok"] = False
                                i = int(np.argmax(sb != db))
                                row["err"] = (
                                    f"col {c!r}: float BIT multisets differ "
                                    f"(spark={sb[i]:016x} duck={db[i]:016x})"
                                )
                                break
            else:
                row["mode"] = "rows-only"
                row["ok"] = len(sdf) >= 0  # runs + stable schema
                row["rows"] = len(sdf)
        except Exception as ex:  # noqa: BLE001 — every failure is a red row
            row["err"] = f"{type(ex).__name__}: {ex}"[:300]
        row["sec"] = round(time.time() - t0, 2)
        report[name] = row
        n_fail += 0 if row["ok"] else 1
        print(
            f"{'ok  ' if row['ok'] else 'FAIL'} {name} "
            f"[{row['mode']}, {row['sec']}s]"
            + (f" -- {row['err']}" if row["err"] else ""),
            flush=True,
        )

    print(f"\n{len(window) - n_fail}/{len(window)} passed (window of {args.n})")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)
    return n_fail


if __name__ == "__main__":
    raise SystemExit(main())
