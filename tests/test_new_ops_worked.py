"""Worked-example and invariant tests for the round-5 additions.

The DuckDB oracles prove cross-engine agreement; these prove the MATH —
an algorithm implemented identically wrong on both sides would still pass
the oracle, so each new operator family gets an independent referent:
a hand-computed example (Slope One, triangles), a brute-force recompute
(MAD), or a statistical contract (Poisson bootstrap, EWMA edge rows).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recsys_spark_spark.cf.slopeone import deviation_pairs, slope_one_recommend
from recsys_spark_spark.operators.analytics import triangle_counts
from recsys_spark_spark.registry import load_all
from tests.conftest import SF_SMOKE

QUERIES, _ = load_all()

A, B, C = 1, 2, 3


@pytest.fixture(scope="module")
def ui(spark):
    # u1 -> {A:3, B:1}, u2 -> {A:1, B:2, C:1}, u3 -> {B:1, C:2}
    rows = [(1, A, 3), (1, B, 1), (2, A, 1), (2, B, 2), (2, C, 1), (3, B, 1), (3, C, 2)]
    return spark.createDataFrame(rows, "user_id long, item_id long, cnt long")


def test_slope_one_deviations_hand_example(ui):
    # dev sums (cand - src): (A->B): u1: 1-3=-2, u2: 2-1=+1 => -1 over c=2
    #                        (A->C): u2: 1-1=0 over c=1
    #                        (B->C): u2: 1-2=-1, u3: 2-1=+1 => 0 over c=2
    got = {(r.src, r.cand): (r.dsum, r.c) for r in deviation_pairs(ui).collect()}
    assert got == {
        (A, B): (-1, 2), (B, A): (1, 2),
        (A, C): (0, 1), (C, A): (0, 1),
        (B, C): (0, 2), (C, B): (0, 2),
    }


def test_slope_one_recommend_hand_example(ui):
    # u1 (seen A,B) -> C: via A (3*1+0=3) + via B (1*2+0=2) => 5/3 = 1.666667
    # u3 (seen B,C) -> A: via B (1*2+1=3) + via C (2*1+0=2) => 5/3 = 1.666667
    # u2 saw everything -> no recs
    recs = {(r.user_id, r.item_id): (r.pred, r.rnk) for r in slope_one_recommend(ui).collect()}
    assert recs == {(1, C): (1.666667, 1), (3, A): (1.666667, 1)}


def test_triangle_counts_hand_example(spark):
    # K4 minus edge (2,4): edges (1,2)(1,3)(1,4)(2,3)(3,4) -> triangles
    # {1,2,3} and {1,3,4}; per-vertex: 1->2, 2->1, 3->2, 4->1.
    e = spark.createDataFrame([(1, 2), (1, 3), (1, 4), (2, 3), (3, 4)], "x long, y long")
    got = {r.item_id: r.n_triangles for r in triangle_counts(e).collect()}
    assert got == {1: 2, 2: 1, 3: 2, 4: 1}


def test_mad_outliers_match_bruteforce(spark):
    import numpy as np

    got = {
        r.c_mktsegment: r
        for r in QUERIES["q_outlier_mad"](spark, SF_SMOKE).collect()
    }
    pdf = (
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .select("c_mktsegment", "c_acctbal")
        .toPandas()
    )
    pdf["cents"] = (pdf.c_acctbal * 100).round().astype("int64")
    for seg, grp in pdf.groupby("c_mktsegment"):
        med2 = int(round(2 * float(np.median(grp.cents))))
        dev2 = (2 * grp.cents - med2).abs()
        mad4 = int(round(2 * float(np.median(dev2))))
        n_out = int((dev2 * 20000 > 44478 * mad4).sum())
        r = got[seg]
        assert r.n_customers == len(grp)
        assert r.median_bal == round(med2 / 200.0, 6), seg
        assert r.mad_bal == round(mad4 / 400.0, 6), seg
        assert r.n_outliers == n_out, seg


def test_bootstrap_replicates_estimate_the_mean(spark):
    reps = QUERIES["q_sample_bootstrap"](spark, SF_SMOKE).collect()
    assert len(reps) == 20
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    agg = o.agg(
        F.count(F.lit(1)).alias("n"), F.avg("o_totalprice").alias("mean")
    ).collect()[0]
    for r in reps:
        # Poisson(1) weights: sum w concentrates at n (sd = sqrt(n));
        # each resampled mean stays within a loose 6 sigma of the truth.
        assert abs(r.n_drawn - agg.n) <= 6 * math.sqrt(agg.n), r
        assert abs(r.mean_total - agg.mean) / agg.mean < 0.1, r


def test_ewma_first_order_equals_value(spark):
    """A customer's FIRST order has no lags: its EWMA must equal the raw
    cents exactly (weight renormalization over present lags)."""
    df = QUERIES["q_ts_ewma"](spark, SF_SMOKE)
    w = F.row_number().over(
        Window.partitionBy("o_custkey").orderBy("order_day", "o_orderkey")
    )
    firsts = df.withColumn("_rn", w).where(F.col("_rn") == 1)
    bad = firsts.where(F.col("ewma_cents") != F.col("cents")).count()
    assert bad == 0


def test_hybrid_rec_serves_both_branches(spark):
    """Both hybrid sources must be non-empty at every tested SF — a
    cold branch that matches nobody would make the fallback oracle
    vacuous (the q_dedup_canonical lesson)."""
    src = {
        r.source: r.n
        for r in QUERIES["q_cf_hybrid_rec"](spark, SF_SMOKE)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert src.get("cf", 0) > 0 and src.get("cold_popularity", 0) > 0, src


def test_auc_matches_pairwise_bruteforce(spark):
    """Rank-sum AUC must equal the O(n_pos*n_neg) pairwise definition
    P(score_pos > score_neg) + 0.5*P(tie), computed directly in numpy."""
    import numpy as np

    row = QUERIES["q_eval_auc"](spark, SF_SMOKE).collect()[0]
    pdf = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_totalprice", "o_orderpriority"
    ).toPandas()
    cents = (pdf.o_totalprice * 100).round().astype("int64").values
    lab = (pdf.o_orderpriority == "1-URGENT").values
    pos, neg = cents[lab], cents[~lab]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    assert abs(row.auc - auc) < 1e-6, (row.auc, auc)


def test_q21_shape_matches_dataframe_composition(spark):
    """The SQL-mode Q21 pattern must equal an independently hand-composed
    DataFrame plan (per-order late/peer flags -> only-late filter), so a
    decorrelation bug that altered semantics identically in both engines'
    SQL paths would still be caught."""
    got = {
        (r.s_name,): r.numwait
        for r in QUERIES["q_sql_q21_shape"](spark, SF_SMOKE).collect()
    }
    from recsys_spark_spark.catalog import table

    l = table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderdate")
    s = table(spark, SF_SMOKE, "supplier").select("s_suppkey", "s_name")
    j = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60)
        ).cast("int").alias("late"),
    )
    per_supp = j.groupBy("l_orderkey", "l_suppkey").agg(F.max("late").alias("late"))
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    lone = (
        per_supp.where(F.col("late") == 1)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    # numwait counts LATE LINEITEMS (l1 rows), not late (order, supplier)
    # pairs — rejoin the qualifying pairs to the late base rows.
    base_late = j.where(F.col("late") == 1).drop("late")
    want_df = (
        base_late.join(lone.select("l_orderkey", "l_suppkey"), ["l_orderkey", "l_suppkey"])
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    want = {(r.s_name,): r.numwait for r in want_df.collect()}
    assert got == want


def test_target_encode_loo_matches_pandas(spark):
    """The LOO encoding must equal a per-segment pandas recompute:
    enc = (pos_seg - y) / (cnt_seg - 1), rounded half-away to ppm."""
    got = {
        r.o_orderkey: (r.segment, r.label, r.loo_num, r.loo_den, r.enc_ppm)
        for r in QUERIES["q_target_encode_loo"](spark, SF_SMOKE).collect()
    }
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    pdf = o.join(c, o.o_custkey == c.c_custkey).toPandas()
    pdf["label"] = (pdf.o_orderpriority == "1-URGENT").astype("int64")
    stats = pdf.groupby("c_mktsegment").label.agg(["count", "sum"])
    assert len(got) == len(pdf)
    for row in pdf.itertuples():
        cnt, pos = stats.loc[row.c_mktsegment]
        num, den = int(pos - row.label), int(cnt - 1)
        want_ppm = math.floor(1e6 * num / den + 0.5)
        assert got[row.o_orderkey] == (
            row.c_mktsegment, row.label, num, den, want_ppm
        ), row


def test_woe_iv_matches_numpy(spark):
    """WOE/IV must equal the closed-form Haldane-smoothed definition
    recomputed scalar-by-scalar in plain Python."""
    rows = {r.segment: r for r in QUERIES["q_woe_iv"](spark, SF_SMOKE).collect()}
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_custkey", "o_orderpriority"
    )
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    pdf = o.join(c, o.o_custkey == c.c_custkey).toPandas()
    pdf["label"] = (pdf.o_orderpriority == "1-URGENT").astype("int64")
    g = pdf.groupby("c_mktsegment").label.agg(["sum", "count"])
    tp = int(g["sum"].sum())
    tn = int((g["count"] - g["sum"]).sum())
    for seg, srow in g.iterrows():
        pos, neg = int(srow["sum"]), int(srow["count"] - srow["sum"])
        woe = round(math.log(((pos + 0.5) * (tn + 0.5)) / ((neg + 0.5) * (tp + 0.5))), 6)
        iv = round((pos / tp - neg / tn) * woe, 9)
        r = rows[seg]
        assert (r.pos, r.neg) == (pos, neg), seg
        assert abs(r.woe - woe) < 1e-12, (seg, r.woe, woe)
        assert abs(r.iv_term - iv) < 1e-12, (seg, r.iv_term, iv)


def test_ts_interp_linear_matches_python_loop(spark):
    """The windowed interpolation must equal a per-user O(n) python loop
    over the dense calendar: carry prev/next anchors, fill interior gaps
    with prev + round((next-prev)*step/gap). Also: anchors are never
    marked interpolated, and every user's span is fully dense."""
    import datetime as dt

    got = {}
    for r in QUERIES["q_ts_interp_linear"](spark, SF_SMOKE).collect():
        got[(r.user_id, r.day_str)] = (r.is_interp, r.val_micro)

    e = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .where(F.col("event_type") != "error")
        .select("user_id", F.to_date("ts").alias("day"), "value")
        .toPandas()
    )
    e["vm"] = [math.floor(v * 1e6 + 0.5) if v >= 0 else -math.floor(-v * 1e6 + 0.5) for v in e.value]
    daily = e.groupby(["user_id", "day"]).vm.sum()
    want = {}
    for uid, series in daily.groupby(level=0):
        days = {d: int(v) for (_, d), v in series.items()}
        d0, d1 = min(days), max(days)
        anchors = sorted(days)
        cur = d0
        ai = 0
        while cur <= d1:
            key = (uid, cur.strftime("%Y-%m-%d"))
            if cur in days:
                want[key] = (0, days[cur])
                if anchors[ai] < cur:
                    ai += 1
            else:
                prev_d, next_d = anchors[ai], anchors[ai + 1] if anchors[ai] <= cur else None
                if prev_d > cur:  # pragma: no cover - spine starts at an anchor
                    raise AssertionError
                while anchors[ai + 1] < cur:
                    ai += 1
                prev_d, next_d = anchors[ai], anchors[ai + 1]
                pv, nv = days[prev_d], days[next_d]
                step = (cur - prev_d).days
                gap = (next_d - prev_d).days
                x = (nv - pv) * step / gap
                r = math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)
                want[key] = (1, pv + r)
            cur += dt.timedelta(days=1)
    assert got == want


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_event_id_unique_on_fixtures(spark, sf_dir):
    """q_session_paths' struct sort (ts, event_id, event_type) matches its
    oracle's (ts, event_id)-ordered string_agg only while event_id never
    ties within a user — guaranteed by global event_id uniqueness. Guard it
    per fixture so a regenerated events table with duplicate ids fails here
    instead of silently diverging (r5 ADVICE)."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    n, d = e.agg(F.count("event_id"), F.countDistinct("event_id")).first()
    assert n == d, f"{sf_dir}: {n - d} duplicate event_ids"


def test_bpe_train_matches_python_reference(spark):
    """The learned merge table must equal a from-scratch Sennrich-style
    BPE (count overlapping adjacent pairs weighted by word freq, merge
    the (count desc, pair asc)-best pair left-to-right non-overlapping,
    repeat) run in plain Python over the same word dictionary."""
    import re
    from collections import Counter

    got = QUERIES["q_text_bpe_train"](spark, SF_SMOKE).orderBy("step").collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    words = Counter()
    for t in docs.text:
        words.update(re.findall(r"[a-z]+", t.lower()))
    seqs = {tuple(w): f for w, f in words.items()}
    expect = []
    for step in range(1, 9):
        pc = Counter()
        for syms, f in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((step, f"{l} {r}", l + r, cnt))
        merged = {}
        for syms, f in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + f
        seqs = merged
    assert [
        (row.step, row.pair, row.new_symbol, row.pair_count) for row in got
    ] == expect


def test_setjoin_prefix_lossless_vs_naive_allpairs(spark):
    """Prefix + size filtering must be LOSSLESS: the filtered join's pair
    set equals a naive all-pairs Jaccard join (no candidate pruning at
    all) over the same restricted universe (same-lang, >=10 tokens)."""
    import duckdb

    got = {
        (r.d1, r.d2, r.inter, r.n1, r.n2, r.jacc_ppm)
        for r in QUERIES["q_sim_setjoin_prefix"](spark, SF_SMOKE).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    naive = con.execute(
        """
WITH dd AS (
  SELECT doc_id, lang, list_distinct(string_split(text,' ')) AS tset,
         len(list_distinct(string_split(text,' '))) AS n
  FROM documents WHERE len(list_distinct(string_split(text,' '))) >= 10
)
SELECT a.doc_id, b.doc_id,
       len(list_intersect(a.tset, b.tset)),
       a.n, b.n,
       (len(list_intersect(a.tset, b.tset)) * 1000000)
         // (a.n + b.n - len(list_intersect(a.tset, b.tset)))
FROM dd a JOIN dd b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.tset, b.tset)) * 20
      >= (a.n + b.n - len(list_intersect(a.tset, b.tset))) * 19
"""
    ).fetchall()
    assert got == {tuple(r) for r in naive} and len(got) > 0


def _write_duplicate_fixture(tmp_path) -> str:
    """documents.parquet with real duplicate mass — the shipped test SFs
    have (almost) none, so the round-7 representative+multiplicity paths
    (within-group C(m,2) pairs, cross-group m1·m2 expansion) would
    otherwise never fire in tests. 40-token sets so the one-token edit
    keeps J = 39/41 ≈ 0.9512 ≥ 0.95."""
    def tok(i: int) -> str:  # purely alphabetic: q_dedup_containment
        return f"tok{chr(97 + i // 26)}{chr(97 + i % 26)}"  # tokenizes [a-z]+

    text_a = " ".join(tok(i) for i in range(40))
    text_b = " ".join("zzz" if i == 20 else tok(i) for i in range(40))
    text_c = " ".join("x" + tok(i) for i in range(40))
    text_d = " ".join(tok(i) for i in range(20))  # strict subset of A
    rows = [
        (1, text_a, "en", "src0"),
        (2, text_a, "en", "src0"),
        (3, text_a, "en", "src1"),
        (4, text_b, "en", "src1"),
        (5, text_b, "en", "src1"),
        (6, text_c, "en", "src2"),
        (7, text_d, "en", "src2"),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df.text.str.len().astype("int64")
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_setjoin_duplicate_mass_expansion_exact(spark, tmp_path):
    """The rep-level prefix join + member expansion must emit EXACTLY the
    doc-level pair table: every within-group pair (identical sets,
    jacc_ppm = 1000000) and every cross-group member pair, against a
    brute-force all-pairs python referent."""
    import itertools

    sf = _write_duplicate_fixture(tmp_path)
    got = {
        (r.d1, r.d2, r.inter, r.n1, r.n2, r.jacc_ppm)
        for r in QUERIES["q_sim_setjoin_prefix"](spark, sf).collect()
    }
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    sets = {int(r.doc_id): set(r.text.split()) for r in docs.itertuples()}
    expect = set()
    for (i, si), (j, sj) in itertools.combinations(sorted(sets.items()), 2):
        inter, union = len(si & sj), len(si | sj)
        if len(si) >= 10 and len(sj) >= 10 and inter * 20 >= union * 19:
            expect.add((i, j, inter, len(si), len(sj), inter * 1000000 // union))
    assert got == expect and len(got) == 10
    assert (1, 2, 40, 40, 40, 1000000) in got  # within-group (3 copies of A)
    assert (1, 4, 39, 40, 40, 951219) in got  # cross-group expansion (A x B)


def test_contamination_multiplicity_reconstruction(spark, tmp_path):
    """The contamination matrix computed on (md5(text), source)
    representatives with m1·m2 / C(m,2) reconstruction must equal the
    matrix aggregated from the UNCHANGED doc-level q_dedup_minhash_exact
    pair table — two independent code paths over the same signatures."""
    from collections import Counter

    sf = _write_duplicate_fixture(tmp_path)
    got = {
        (r.src1, r.src2): (r.n_pairs, r.n_cross)
        for r in QUERIES["q_dedup_contamination"](spark, sf).collect()
    }
    pairs = QUERIES["q_dedup_minhash_exact"](spark, sf).toPandas()
    pairs = pairs[pairs.est_jaccard >= 0.5]
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    src = dict(zip(docs.doc_id, docs.source))
    n_pairs, n_cross = Counter(), Counter()
    for r in pairs.itertuples():
        k = tuple(sorted((src[r.d1], src[r.d2])))
        n_pairs[k] += 1
        if k[0] != k[1]:
            n_cross[k] += 1
    assert got == {k: (n_pairs[k], n_cross.get(k, 0)) for k in n_pairs}
    # the within-(text,source) C(m,2) path fired: 2 copies of A at src0
    assert got[("src0", "src0")][0] >= 1


def test_containment_duplicate_mass_reconstruction(spark, tmp_path):
    """q_dedup_containment's rep-level probe + group-aggregate
    reconstruction (m-1 copies + sum of containing-group multiplicities,
    extremum-aware min/max) vs a brute-force subset scan over the
    duplicate fixture."""
    sf = _write_duplicate_fixture(tmp_path)
    got = {
        (r.doc_id, r.lang, r.n_tokens, r.n_containers, r.min_container,
         r.max_container)
        for r in QUERIES["q_dedup_containment"](spark, sf).collect()
    }
    import re

    docs = pd.read_parquet(f"{sf}/documents.parquet")
    sets = {
        int(r.doc_id): (r.lang, frozenset(re.findall(r"[a-z]+", r.text.lower())))
        for r in docs.itertuples()
    }
    expect = set()
    for a, (la, sa) in sets.items():
        if len(sa) < 15:
            continue
        containers = [
            b for b, (lb, sb) in sets.items()
            if b != a and lb == la and sa <= sb
        ]
        if containers:
            expect.add(
                (a, la, len(sa), len(containers), min(containers), max(containers))
            )
    assert got == expect and len(got) > 0
    # both reconstruction paths fired: doc 1 (copy extremum) and doc 7 (subset)
    assert (1, "en", 40, 2, 2, 3) in got
    assert (7, "en", 20, 5, 1, 5) in got  # D subset of all A and B copies


def test_dedup_clusters_duplicate_mass_star_expansion(spark, tmp_path):
    """q_dedup_clusters' rep-graph + star-edge construction must produce the
    same components and min-labels as a brute-force union-find over the
    doc-level near-dup rule (same lang, |Δn_chars| ≤ 32, token-J ≥ 0.9) on
    a fixture with real duplicate mass."""
    sf = _write_duplicate_fixture(tmp_path)
    got = {
        (r.doc_id, r.cluster, r.is_rep)
        for r in QUERIES["q_dedup_clusters"](spark, sf).collect()
    }
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    toks = {int(r.doc_id): set(r.text.split()) for r in docs.itertuples()}
    meta = {int(r.doc_id): (r.lang, len(r.text)) for r in docs.itertuples()}
    parent = {d: d for d in toks}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    linked = set()
    ids = sorted(toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if meta[a][0] != meta[b][0] or abs(meta[a][1] - meta[b][1]) > 32:
                continue
            inter = len(toks[a] & toks[b])
            if inter / (len(toks[a]) + len(toks[b]) - inter) >= 0.9:
                linked |= {a, b}
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    expect = {(d, find(d), d == find(d)) for d in linked}
    assert got == expect and len(got) > 0
    # the star path fired: doc 2 (copy of doc 1) labels to cluster 1
    assert (2, 1, False) in got


def test_bpe_encode_matches_python_reference(spark):
    """Per-doc BPE token counts must equal a plain-Python Sennrich
    encoder: learn 8 merges from the word dict, apply them in order
    (left-to-right, non-overlapping) to every document's words."""
    import re
    from collections import Counter

    got = {
        r.doc_id: (r.n_words, r.n_chars, r.n_tokens)
        for r in QUERIES["q_text_bpe_encode"](spark, SF_SMOKE).collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    words = Counter()
    for t in docs.text:
        words.update(re.findall(r"[a-z]+", t.lower()))
    seqs = {tuple(w): f for w, f in words.items()}
    merges = []
    for _ in range(8):
        pc = Counter()
        for syms, f in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        (l, r), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r))
        merged = {}
        for syms, f in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + f
        seqs = merged
    def encode_len(w):
        syms = list(w)
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)
    tok_len = {w: encode_len(w) for w in words}
    expect = {}
    for doc_id, t in zip(docs.doc_id, docs.text):
        ws = re.findall(r"[a-z]+", t.lower())
        if ws:
            expect[doc_id] = (
                len(ws), sum(len(w) for w in ws), sum(tok_len[w] for w in ws)
            )
    assert got == expect


def test_star_contract_matches_union_find(spark):
    """star_contract must produce the exact union-find components on a
    hand-built multi-component graph with an adversarial long path (the
    shape that stalls hash-min variants — module comment in analytics.py).
    Also pins convergence margin: one extra round changes nothing."""
    from recsys_spark_spark.operators.analytics import star_contract

    # path 1-2-...-30 (descending-id adversarial relabel), a 5-clique on
    # 100..104, one isolated edge (200, 201), and a star at 300.
    edges = [(i + 1, i) for i in range(1, 30)]
    edges += [(b, a) for a in range(100, 105) for b in range(a + 1, 105)]
    edges += [(201, 200)] + [(300 + k, 300) for k in (1, 2, 3)]
    e = spark.createDataFrame(edges, "a long, b long")

    par = {}
    def find(x):
        par.setdefault(x, x)
        while par[x] != x:
            par[x] = par.setdefault(par[x], par[x])
            x = par[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            par[max(ra, rb)] = min(ra, rb)
    want = {(v, find(v)) for v in par if v != find(v)}

    got8 = {(r.a, r.b) for r in star_contract(e, 8).collect()}
    got9 = {(r.a, r.b) for r in star_contract(e, 9).collect()}
    assert got8 == want and got9 == want


def test_graph_components_converged_at_smoke(spark):
    """The registered query's labels at SF_SMOKE must equal union-find on
    the same thresholded edge set (i.e. CC_ROUNDS has converged, not just
    cross-engine-agreed)."""
    from recsys_spark_spark.cf.itemcf import capped_interactions, cooccurrence
    from recsys_spark_spark.operators.analytics import (
        TRI_MIN_SUPPORT,
        TRI_USERS_PER_SUPPORT,
    )

    ui = capped_interactions(spark, SF_SMOKE)
    n_users = ui.select("user_id").distinct().count()
    floor = max(TRI_MIN_SUPPORT, math.ceil(n_users / TRI_USERS_PER_SUPPORT))
    edges = [
        (r.item_j, r.item_i)
        for r in cooccurrence(ui).where(F.col("n_common") >= floor).collect()
    ]
    par = {}
    def find(x):
        par.setdefault(x, x)
        while par[x] != x:
            par[x] = par.setdefault(par[x], par[x])
            x = par[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            par[max(ra, rb)] = min(ra, rb)
    comps = {}
    for v in par:
        comps.setdefault(find(v), set()).add(v)
    want = {
        (v, root, len(vs)) for root, vs in comps.items() for v in vs
    }
    got = {
        (r.item_id, r.component_id, r.comp_size)
        for r in QUERIES["q_graph_components"](spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_cms_never_underestimates_and_is_linear(spark):
    """The two CMS contracts the oracle can't see: (a) every estimate is
    >= the exact count (each cell sums the true count plus collisions);
    (b) linearity — cell tables of a disjoint split sum to the whole-data
    cell table, the property that makes the sketch mergeable/incremental."""
    from recsys_spark_spark.operators.aggregates import cms_cells

    rows = QUERIES["q_cms_heavy_hitters"](spark, SF_SMOKE).collect()
    assert len(rows) == 20
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.n_cms_est == r.n_exact + r.overestimate for r in rows)

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        F.col("l_partkey").alias("item"), "l_orderkey"
    )
    whole = {
        (r.j, r.bucket): r.cnt for r in cms_cells(li.select("item")).collect()
    }
    even = cms_cells(li.where(F.col("l_orderkey") % 2 == 0).select("item"))
    odd = cms_cells(li.where(F.col("l_orderkey") % 2 == 1).select("item"))
    summed: dict = {}
    for r in even.collect() + odd.collect():
        summed[(r.j, r.bucket)] = summed.get((r.j, r.bucket), 0) + r.cnt
    assert summed == whole


def test_pq_adc_matches_numpy_reference(spark):
    """ADC top-k must equal a numpy recompute of Jégou ADC: codebook =
    first-4 vectors' subvectors, codes = per-subspace argmin of the
    nano-rounded integer squared distance (ties to smaller sid), ADC
    distance = sum over subspaces of the query->codeword table entry."""
    import numpy as np

    from recsys_spark_spark.llm.similarity import (
        PQ_ADC_TOPK,
        PQ_CODEBOOK,
        PQ_NQ,
        PQ_SUBDIM,
        PQ_SUBSPACES,
    )

    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = emb.vec_id.to_numpy()
    V = np.array([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    sq = lambda a, b: int(
        sum(int(math.floor(((x - y) * (x - y)) * 1e12 + 0.5)) for x, y in zip(a, b))
    )
    sub = lambda v, s: v[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
    cb = V[:PQ_CODEBOOK]
    codes = {}
    for vid, v in zip(ids, V):
        for s in range(PQ_SUBSPACES):
            d = [(sq(sub(v, s), sub(c, s)), ids[k]) for k, c in enumerate(cb)]
            codes[(vid, s)] = min(d)[1]
    want = set()
    for qid, q in zip(ids[:PQ_NQ], V[:PQ_NQ]):
        dtab = {
            (s, ids[k]): sq(sub(q, s), sub(c, s))
            for s in range(PQ_SUBSPACES)
            for k, c in enumerate(cb)
        }
        scored = sorted(
            (sum(dtab[(s, codes[(vid, s)])] for s in range(PQ_SUBSPACES)), vid)
            for vid in ids
            if vid != qid
        )
        for rnk, (t, vid) in enumerate(scored[:PQ_ADC_TOPK], 1):
            want.add((qid, vid, math.floor(t / 1e12 * 1e6 + 0.5) / 1e6, rnk))
    got = {
        (r.query_id, r.neighbor_id, r.adc_dist, r.rnk)
        for r in QUERIES["q_sim_pq_adc"](spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) == PQ_NQ * PQ_ADC_TOPK


def test_rake_matches_python_reference(spark):
    """Corpus-level RAKE top-20 must equal a plain-Python implementation
    of Rose et al. 2010: phrases = stopword-free runs, word score =
    deg/freq (micro-rounded), phrase score = sum of word scores."""
    import re
    from collections import Counter

    from recsys_spark_spark.llm.text import _STOPWORDS

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    occ = []
    for t in docs.text:
        run = []
        for w in re.findall(r"[a-z]+", t.lower()):
            if w in _STOPWORDS:
                if run:
                    occ.append(tuple(run))
                run = []
            else:
                run.append(w)
        if run:
            occ.append(tuple(run))
    freq, deg = Counter(), Counter()
    for p in occ:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    score_s = {w: math.floor(deg[w] * 1e6 / freq[w] + 0.5) for w in freq}
    n_occ = Counter(occ)
    scored = sorted(
        (-sum(score_s[w] for w in p), " ".join(p), len(p), c)
        for p, c in n_occ.items()
    )[:20]
    want = {
        (ph, nw, c, -neg / 1e6, rnk)
        for rnk, (neg, ph, nw, c) in enumerate(scored, 1)
    }
    got = {
        (r.phrase, r.n_words, r.n_occurrences, r.rake_score, r.rnk)
        for r in QUERIES["q_text_rake"](spark, SF_SMOKE).collect()
    }
    assert got == want


def test_friedman_matches_python_reference(spark):
    """Friedman Q from a plain-Python midrank recompute over the
    (nation, priority) revenue-cents cells must equal the query."""
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j.o_totalprice * 100).map(lambda v: math.floor(v + 0.5))
    cells = j.groupby(["c_nationkey", "o_orderpriority"]).cents.sum()
    blocks = {}
    for (b, g), v in cells.items():
        blocks.setdefault(b, {})[g] = v
    blocks = {b: d for b, d in blocks.items() if len(d) == 5}
    two_r = {}
    for b, d in blocks.items():
        vals = sorted(d.values())
        for g, v in d.items():
            less = sum(1 for x in vals if x < v)
            eq = sum(1 for x in vals if x == v)
            two_r[g] = two_r.get(g, 0) + 2 * (less + 1) + eq - 1
    n, k = len(blocks), 5
    sq = sum(r * r for r in two_r.values())
    q_stat = 12.0 * sq / (4.0 * n * k * (k + 1)) - 3.0 * n * (k + 1)
    rows = QUERIES["q_stat_friedman"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_blocks == n
        assert r.rank_sum_2x == two_r[r.o_orderpriority]
        assert r.q_stat == math.floor(q_stat * 1e6 + 0.5) / 1e6
        assert 0.0 <= r.p_value <= 1.0


def test_holt_winters_structure_and_seasonality(spark):
    """Structural contract for the HW fold (the recursive-CTE oracle is
    the math referent, as for q_ts_holt): every >=2-season series emits
    exactly h=1..7 rows sharing (level, trend), forecast decomposes as
    level + h*trend + a seasonal term bounded by the series range, and
    the seasonal terms differ across h (a season is actually carried)."""
    rows = QUERIES["q_ts_holt_winters"](spark, SF_SMOKE).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert len(by_type) == 5
    for et, rs in by_type.items():
        assert sorted(r.h for r in rs) == list(range(1, 8))
        assert len({(r.level, r.trend, r.n_days) for r in rs}) == 1
        seas = [r.forecast - (r.level + r.h * r.trend) for r in sorted(rs, key=lambda r: r.h)]
        assert max(seas) > min(seas)  # non-degenerate seasonal state
        assert all(abs(s) < 10 * abs(rs[0].level) + 1e3 for s in seas)


def test_wilcoxon_matches_python_reference(spark):
    """W+, W-, z from a plain-Python midrank recompute of the paired
    first-vs-last cent differences must equal the query."""
    o = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
        .toPandas()
    )
    o["cents"] = (o.o_totalprice * 100).map(lambda v: math.floor(v + 0.5))
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    diffs = []
    for _, g in o.groupby("o_custkey"):
        if len(g) >= 2:
            d = int(g.cents.iloc[-1]) - int(g.cents.iloc[0])
            if d != 0:
                diffs.append(d)
    ads = sorted(abs(d) for d in diffs)
    n = len(ads)
    two_wp = 0
    for d in diffs:
        if d > 0:
            less = sum(1 for a in ads if a < abs(d))
            eq = sum(1 for a in ads if a == abs(d))
            two_wp += 2 * (less + 1) + eq - 1
    tsum = 0
    from collections import Counter
    for _, t in Counter(ads).items():
        tsum += t * t * t - t
    wp = two_wp / 2.0
    wm = float(n) * (n + 1) / 2.0 - two_wp / 2.0
    zs = (two_wp / 2.0 - float(n) * (n + 1) / 4.0) / math.sqrt(
        float(n) * (n + 1) * (2 * n + 1) / 24.0 - float(tsum) / 48.0
    )
    r = QUERIES["q_stat_wilcoxon"](spark, SF_SMOKE).collect()[0]
    assert r.n_pairs == n
    assert r.w_plus == math.floor(wp * 1e6 + 0.5) / 1e6
    assert r.w_minus == math.floor(wm * 1e6 + 0.5) / 1e6
    assert r.z_stat == math.copysign(math.floor(abs(zs) * 1e6 + 0.5), zs) / 1e6
    assert 0.0 <= r.p_two_sided <= 1.0


def test_named_params_bind_as_literals(spark):
    """The bound :cutoff date must reach the scan as a pushed filter —
    parameter binding must not defeat pushdown."""
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        QUERIES["q_sql_named_params"](spark, SF_SMOKE)._jdf.queryExecution(),
        "formatted",
    )
    assert "PushedFilters" in plan and "o_orderdate" in plan.split("PushedFilters", 1)[1][:400]


def test_observe_metrics_match_direct_aggregate(spark):
    """The observation collected during the write must equal the same
    aggregates computed directly."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    direct = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_quantity").cast("long").alias("mn"),
        F.max("l_quantity").cast("long").alias("mx"),
    ).collect()[0]
    r = QUERIES["q_observe_metrics"](spark, SF_SMOKE).collect()[0]
    assert (r.n_rows, r.min_qty, r.max_qty) == (direct.n, direct.mn, direct.mx)


def test_khop_matches_python_bfs(spark):
    """Per-seed per-hop reach counts must equal a plain-Python BFS over
    the same thresholded edge set."""
    from collections import defaultdict

    from recsys_spark_spark.operators.analytics import (
        KHOP_HOPS,
        KHOP_SEEDS,
        thresholded_edges,
    )

    edges = [(r.a, r.b) for r in thresholded_edges(spark, SF_SMOKE).collect()]
    adj = defaultdict(set)
    deg = defaultdict(int)
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
        deg[a] += 1; deg[b] += 1
    seeds = [u for u, _ in sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:KHOP_SEEDS]]
    want = set()
    for s in seeds:
        visited, frontier = {s}, {s}
        for h in range(1, KHOP_HOPS + 1):
            frontier = {v for u in frontier for v in adj[u]} - visited
            visited |= frontier
            if frontier:
                want.add((s, h, len(frontier)))
    got = {
        (r.seed, r.hop, r.n_reached)
        for r in QUERIES["q_graph_khop"](spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_calibration_matches_pandas_reference(spark):
    """Per-cell p_pred/p_obs/Brier must equal a pandas recompute of the
    temporal-split empirical-rate backtest."""
    from recsys_spark_spark.llm.features import CALIB_SPLIT

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["y"] = (j.o_orderstatus == "F").astype(int)
    import pandas as pd

    tr = j[j.o_orderdate < pd.Timestamp(CALIB_SPLIT)]
    te = j[j.o_orderdate >= pd.Timestamp(CALIB_SPLIT)]
    r6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
    want = {}
    for (seg, prio), g in tr.groupby(["c_mktsegment", "o_orderpriority"]):
        h = te[(te.c_mktsegment == seg) & (te.o_orderpriority == prio)]
        if len(h) == 0:
            continue
        n, k = len(g), int(g.y.sum())
        nt, kt = len(h), int(h.y.sum())
        p = k / n
        want[(seg, prio)] = (
            n, nt, r6(p), r6(kt / nt), r6((nt * p * p - 2 * p * kt + kt) / nt)
        )
    got = {
        (r.c_mktsegment, r.o_orderpriority): (
            r.n_train, r.n_test, r.p_pred, r.p_obs, r.brier
        )
        for r in QUERIES["q_eval_calibration"](spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) == 25


def test_swing_hand_example(spark):
    """Swing on a hand-built matrix: users 1,2 share items {A,B} (overlap
    2), user 3 has only A. Pairs for (A,B): only (1,2) -> s(A,B) =
    1/(1+2). Verified against the exact closed form via a temp ui
    override through the same algebra in plain Python."""
    from recsys_spark_spark.cf.swing import SWING_ALPHA

    # hand graph: u1:{A,B,C}, u2:{A,B}, u3:{A,C}
    rows = [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20), (3, 10), (3, 30)]
    # expected: overlaps k(1,2)=2 {A,B}, k(1,3)=2 {A,C}, k(2,3)=1 {A}
    # s(A,B): pairs u<v with both A,B = (1,2) -> 1/(1+2)
    # s(A,C): (1,3) -> 1/(1+2); s(B,C): none
    import itertools
    from collections import defaultdict

    hist = defaultdict(set)
    for u, i in rows:
        hist[u].add(i)
    users = sorted(hist)
    want = defaultdict(float)
    for u, v in itertools.combinations(users, 2):
        k = len(hist[u] & hist[v])
        for i, j in itertools.combinations(sorted(hist[u] & hist[v]), 2):
            want[(i, j)] += math.floor(1e12 / (SWING_ALPHA + k) + 0.5)
    assert dict(want) == {(10, 20): math.floor(1e12 / 3 + 0.5),
                          (10, 30): math.floor(1e12 / 3 + 0.5)}

    got = {
        (r.item_i, r.item_j): (r.n_user_pairs, r.swing)
        for r in QUERIES["q_cf_swing"](spark, SF_SMOKE).collect()
    }
    assert len(got) == 50
    assert all(n >= 1 and s > 0 for n, s in got.values())


def test_swing_matches_python_reference(spark):
    """Full top-50 against a plain-Python Swing recompute with the same
    deterministic per-item user cap."""
    import itertools
    from collections import defaultdict

    from recsys_spark_spark.cf.swing import (
        SWING_ALPHA,
        SWING_TOP,
        SWING_USERS_PER_ITEM,
    )

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    j = o.merge(l, left_on="o_orderkey", right_on="l_orderkey")
    item_users = defaultdict(set)
    for u, i in {(int(r.o_custkey), int(r.l_partkey)) for r in j.itertuples()}:
        item_users[i].add(u)
    capped = {
        i: sorted(us)[:SWING_USERS_PER_ITEM] for i, us in item_users.items()
    }
    pair_items = defaultdict(list)  # (u1,u2) -> items
    for i, us in capped.items():
        for u1, u2 in itertools.combinations(us, 2):
            pair_items[(u1, u2)].append(i)
    score = defaultdict(int)
    npairs = defaultdict(int)
    for (u1, u2), items in pair_items.items():
        w = math.floor(1e12 / (SWING_ALPHA + len(items)) + 0.5)
        for i, jj in itertools.combinations(sorted(items), 2):
            score[(i, jj)] += w
            npairs[(i, jj)] += 1
    top = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:SWING_TOP]
    want = {
        (i, jj, npairs[(i, jj)], math.floor(s / 1e12 * 1e6 + 0.5) / 1e6, rnk)
        for rnk, ((i, jj), s) in enumerate(top, 1)
    }
    got = {
        (r.item_i, r.item_j, r.n_user_pairs, r.swing, r.rnk)
        for r in QUERIES["q_cf_swing"](spark, SF_SMOKE).collect()
    }
    assert got == want


def test_bh_fdr_matches_python_stepup(spark):
    """BH adjusted p-values must equal the textbook step-up recompute on
    the raw p-values the query itself reports."""
    rows = sorted(
        QUERIES["q_stat_bh_fdr"](spark, SF_SMOKE).collect(), key=lambda r: r.p_rank
    )
    m = len(rows)
    assert m == 5
    # recompute adjusted from raw (raw is 9dp-rounded; recompute within 2e-9)
    suffix_min = 1.0
    expect = {}
    for r in reversed(rows):
        suffix_min = min(suffix_min, m * r.p_raw / r.p_rank)
        expect[r.segment] = min(1.0, suffix_min)
    for r in rows:
        assert abs(r.p_bh_adjusted - expect[r.segment]) < 2e-8
        assert r.significant_fdr in (0, 1)
    # monotone non-decreasing in rank
    adj = [r.p_bh_adjusted for r in rows]
    assert adj == sorted(adj)


def test_containment_matches_python_reference(spark):
    """Per-containee container counts must equal a brute-force Python
    recompute of A-subset-of-B over distinct token sets — also proving
    the single-rarest-token prefix filter is LOSSLESS."""
    import re
    from collections import Counter, defaultdict

    from recsys_spark_spark.llm.dedup import CONTAIN_MIN_TOKENS

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    sets = {
        (r.doc_id, r.lang): frozenset(re.findall(r"[a-z]+", r.text.lower()))
        for r in docs.itertuples()
    }
    want = {}
    by_lang = defaultdict(list)
    for (d, lang), ts in sets.items():
        by_lang[lang].append((d, ts))
    for lang, members in by_lang.items():
        for d, ts in members:
            if len(ts) < CONTAIN_MIN_TOKENS:
                continue
            cs = [b for b, bs in members if b != d and ts <= bs]
            if cs:
                want[d] = (lang, len(ts), len(cs), min(cs), max(cs))
    got = {
        r.doc_id: (r.lang, r.n_tokens, r.n_containers, r.min_container, r.max_container)
        for r in QUERIES["q_dedup_containment"](spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_brown_forsythe_matches_python_reference(spark):
    """W from a plain-Python median-centered Levene recompute (doubled
    exact medians, unit-rounded cross-group pre-sum) must equal the
    query's statistic."""
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["x"] = j.o_totalprice.map(lambda v: math.floor(v + 0.5))
    groups = {}
    for seg, g in j.groupby("c_mktsegment"):
        xs = sorted(g.x)
        n = len(xs)
        med2 = xs[n // 2] * 2 if n % 2 else xs[n // 2 - 1] + xs[n // 2]
        z2 = [abs(2 * x - med2) for x in xs]
        groups[seg] = (n, sum(z2), sum(v * v for v in z2))
    k = len(groups)
    nt = sum(n for n, _, _ in groups.values())
    t1 = sum(s1 for _, s1, _ in groups.values())
    t2 = sum(s2 for _, _, s2 in groups.values())
    tsum = sum(math.floor(s1 * s1 / n + 0.5) for n, s1, _ in groups.values())
    w = ((tsum - float(t1) * t1 / nt) / (k - 1)) / ((float(t2) - tsum) / (nt - k))
    r = QUERIES["q_stat_brown_forsythe"](spark, SF_SMOKE).collect()[0]
    assert r.k_groups == k and r.n_total == nt
    assert r.w_stat == math.floor(w * 1e6 + 0.5) / 1e6
    assert 0.0 <= r.p_chi2_approx <= 1.0


def test_asof_tolerance_matches_pandas_merge_asof(spark):
    """The tolerance-bounded as-of must equal pandas merge_asof with
    tolerance= on the same second-truncated events."""
    import pandas as pd

    from recsys_spark_spark.operators.joins import ASOF_TOLERANCE_S

    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .where(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "user_id", F.date_trunc("second", "ts").alias("sec"), "event_type")
        .toPandas()
    )
    clicks = ev[ev.event_type == "click"].sort_values(["sec", "event_id"])
    buys = ev[ev.event_type == "purchase"].sort_values(["sec", "event_id"])
    m = pd.merge_asof(
        buys,
        clicks.rename(columns={"event_id": "click_event_id", "sec": "c_sec"})[
            ["user_id", "c_sec", "click_event_id"]
        ],
        left_on="sec",
        right_on="c_sec",
        by="user_id",
        direction="backward",
        tolerance=pd.Timedelta(seconds=ASOF_TOLERANCE_S),
    )
    want = {
        int(r.event_id): (
            None if pd.isna(r.click_event_id) else int(r.click_event_id),
            None if pd.isna(r.click_event_id) else int((r.sec - r.c_sec).total_seconds()),
        )
        for r in m.itertuples()
    }
    got = {
        r.purchase_event_id: (r.click_event_id, r.staleness_s)
        for r in QUERIES["q_join_asof_tolerance"](spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_clustering_coeff_matches_python_reference(spark):
    """Per-node C(v) must equal a brute-force recompute over the same
    thresholded edges (triangles via neighbor-set intersections)."""
    from collections import defaultdict

    from recsys_spark_spark.operators.analytics import thresholded_edges

    edges = [(r.b, r.a) for r in thresholded_edges(spark, SF_SMOKE).collect()]
    adj = defaultdict(set)
    for x, y in edges:
        adj[x].add(y); adj[y].add(x)
    want = {}
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        tri = sum(len(adj[u] & nb) for u in nb) // 2
        want[v] = (d, tri, math.floor(2e6 * tri / (d * (d - 1)) + 0.5))
    got = {
        r.item_id: (r.deg, r.n_triangles, r.cc_ppm)
        for r in QUERIES["q_graph_clustering_coeff"](spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_cohens_kappa_matches_python_reference(spark):
    """Kappa must equal the textbook computation from a pandas confusion
    matrix of the same two deterministic labelers."""
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    a = o.o_orderpriority.map(
        lambda p: "high" if p in ("1-URGENT", "2-HIGH") else ("mid" if p == "3-MEDIUM" else "low")
    )
    b = o.o_totalprice.map(
        lambda v: "high" if v >= 150000 else ("mid" if v >= 50000 else "low")
    )
    n = len(o)
    agree = int((a == b).sum())
    cx = sum(
        int((a == k).sum()) * int((b == k).sum()) for k in ("high", "mid", "low")
    )
    po, pe = agree / float(n), cx / (float(n) * n)
    r = QUERIES["q_stat_cohens_kappa"](spark, SF_SMOKE).collect()[0]
    assert (r.n, r.agree) == (n, agree)
    assert r.po == math.floor(po * 1e6 + 0.5) / 1e6
    assert r.pe == math.floor(pe * 1e6 + 0.5) / 1e6
    kappa = (po - pe) / (1 - pe)
    assert r.kappa == math.copysign(math.floor(abs(kappa) * 1e6 + 0.5), kappa) / 1e6


def test_croston_matches_python_reference(spark):
    """Full per-part Croston/SBA levels against an independent pandas
    recompute of the documented init + multiply-form updates."""
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    j = o.merge(l, left_on="o_orderkey", right_on="l_orderkey")
    j["day"] = j.o_orderdate.dt.normalize()
    d = j.groupby(["l_partkey", "day"]).l_quantity.sum().reset_index()
    r6 = lambda v: math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6
    want = {}
    for part, g in d.groupby("l_partkey"):
        g = g.sort_values("day")
        q = [float(v) for v in g.l_quantity]
        days = list(g.day)
        m = len(q)
        if m < 2:
            continue
        gaps = [(days[i] - days[i - 1]).days for i in range(1, m)]
        z, p = q[0], float(gaps[0])
        for i in range(1, m):
            z = 0.25 * q[i] + 0.75 * z
            p = 0.25 * gaps[i - 1] + 0.75 * p
        want[part] = (m, r6(z), r6(p), r6(z / p), r6(0.875 * (z / p)))
    got = {
        r.l_partkey: (
            r.n_occurrences, r.size_level, r.interval_level,
            r.croston_rate, r.sba_rate,
        )
        for r in QUERIES["q_ts_croston"](spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_quantile_grid_bound_holds_and_matches_numpy(spark):
    """The emitted error bound must hold per row, the exact reference
    must equal the rank-k order statistic (numpy), and the bin histogram
    must be linear (split halves sum to the whole)."""
    import numpy as np

    rows = QUERIES["q_quantile_grid_sketch"](spark, SF_SMOKE).collect()
    assert sorted(r.pct for r in rows) == [25, 50, 75, 95]
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    v = np.sort(
        np.array([math.floor(x * 100 + 0.5) for x in o.o_totalprice], dtype=np.int64)
    )
    n = len(v)
    for r in rows:
        assert r.n == n
        k = (n * r.pct + 99) // 100
        assert r.exact_cents == int(v[k - 1])
        assert r.abs_err_cents <= r.bound_cents
        assert r.est_cents <= r.exact_cents  # bin lower edge never overshoots

    from recsys_spark_spark.operators.aggregates import QGRID_BINS

    lo, hi = int(v[0]), int(v[-1])
    span = hi - lo + 1
    whole = np.bincount(((v - lo) * QGRID_BINS) // span, minlength=QGRID_BINS)
    h1 = np.bincount(((v[::2] - lo) * QGRID_BINS) // span, minlength=QGRID_BINS)
    h2 = np.bincount(((v[1::2] - lo) * QGRID_BINS) // span, minlength=QGRID_BINS)
    assert (h1 + h2 == whole).all()


def test_containment_mask_prefilter_edge_cases(spark, tmp_path):
    """r8 bitmask-prefilter edge cases for q_dedup_containment: a near-miss
    pair differing in exactly ONE token (the prefilter's weakest case — a
    single missing token has only a ~68% chance of hitting a clear mask
    bit, so the exact intersect must reject whatever slips through), and a
    mask-saturating >256-distinct-token container (all 256 bits set, the
    prefilter passes everything and the exact check must still decide).
    Brute-force subset referent, same contract as the fixture tests."""
    import re

    def tok(i: int) -> str:
        return f"w{chr(97 + i // 26 % 26)}{chr(97 + i % 26)}{chr(97 + i // 676)}"

    big = " ".join(tok(i) for i in range(300))        # saturates the mask
    base = " ".join(tok(i) for i in range(20))        # subset of big
    nearmiss = " ".join("qqq" if i == 7 else tok(i) for i in range(20))
    rows = [
        (1, big, "en", "s0"),
        (2, base, "en", "s0"),
        (3, nearmiss, "en", "s0"),      # NOT a subset of big (qqq missing)
        (4, base, "fr", "s0"),          # same tokens, other lang: no match
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df.text.str.len().astype("int64")
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    got = {
        (r.doc_id, r.lang, r.n_tokens, r.n_containers, r.min_container,
         r.max_container)
        for r in QUERIES["q_dedup_containment"](spark, str(tmp_path)).collect()
    }
    sets = {
        int(r.doc_id): (r.lang, frozenset(re.findall(r"[a-z]+", r.text.lower())))
        for r in df.itertuples()
    }
    expect = set()
    for a, (la, sa) in sets.items():
        if len(sa) < 15:
            continue
        cs = [b for b, (lb, sb) in sets.items() if b != a and lb == la and sa <= sb]
        if cs:
            expect.add((a, la, len(sa), len(cs), min(cs), max(cs)))
    assert got == expect
    assert (2, "en", 20, 1, 1, 1) in got          # subset under saturation
    assert all(r[0] != 3 for r in got)            # near-miss rejected


def test_near_dup_jaccard_prefilter_edge_cases(spark, tmp_path):
    """r8 size/bitmask-prefilter edge cases for the shared near-dup edge
    builder (q_dedup_near_bucketed / q_dedup_clusters): pairs exactly AT the
    J = 0.9 threshold must survive both prunes (one of them also sits
    exactly on the size-prune boundary 10*min(n1,n2) == 9*max(n1,n2)), and
    near-misses just below 0.9 must be rejected whether the mask prunes
    them (zero collisions -> the popcount bound alone proves J < 0.9) or
    the exact intersect does (collisions let them slip through the mask).
    Brute-force all-pairs referent over the same blocking predicates."""

    def tok(i: int) -> str:
        return f"w{chr(97 + i // 26 % 26)}{chr(97 + i % 26)}{chr(97 + i // 676)}"

    t = [tok(i) for i in range(40)]
    docs = {
        # P1: 19/19 tokens, 18 common -> J = 18/20 = 0.9 exactly (kept)
        1: " ".join(t[:19]),
        2: " ".join(t[:18] + ["qqqa"]),
        # P2: 9 vs 10 tokens, 9 common -> J = 9/10 = 0.9 exactly AND the
        # size prune at equality: 10*9 == 9*10 (kept)
        3: " ".join(t[20:29]),
        4: " ".join(t[20:29] + ["qqqb"]),
        # P3: 18/18 tokens, 17 common -> J = 17/19 ~ 0.8947 (near-miss: out)
        5: " ".join(t[:17] + ["qqqc"]),
        # P4 vs doc 4: 8 tokens vs 10 -> size-pruned (J <= 8/10 < 0.9: out)
        6: " ".join(t[20:28]),
    }
    df = pd.DataFrame(
        [(d, txt, "en", "s0") for d, txt in docs.items()],
        columns=["doc_id", "text", "lang", "source"],
    )
    df["n_chars"] = df.text.str.len().astype("int64")
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    got = {
        (r.d1, r.d2): r.jaccard
        for r in QUERIES["q_dedup_near_bucketed"](spark, str(tmp_path)).collect()
    }
    sets = {d: set(txt.split(" ")) for d, txt in docs.items()}
    lens = {d: len(txt) for d, txt in docs.items()}
    expect = {}
    for a in docs:
        for b in docs:
            if a >= b or abs(lens[a] - lens[b]) > 32:
                continue
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= 0.9:
                expect[(a, b)] = round(j, 6)
    assert got == expect
    assert got[(1, 2)] == 0.9 and got[(3, 4)] == 0.9   # threshold pairs kept
    assert (1, 5) not in got and (4, 6) not in got     # near-miss / size out


def test_setjoin_mask_prefilter_tau_boundary(spark, tmp_path):
    """r8 bitmask-prune boundary for q_sim_setjoin_prefix (tau = 19/20):
    a 19-subset-of-20 pair sits EXACTLY at J = 19/20 and must survive the
    popcount prune (20*(n1+n2) >= 39*pu holds with equality only under
    collisions), while an 18-subset-of-19 pair (J = 18/19 ~ 0.947) must be
    rejected by the mask or the exact intersect. Brute-force referent over
    the same predicates."""

    def tok(i: int) -> str:
        return f"w{chr(97 + i // 26 % 26)}{chr(97 + i % 26)}{chr(97 + i // 676)}"

    t = [tok(i) for i in range(40)]
    docs = {
        1: " ".join(t[:19]),        # A ⊂ B, J = 19/20 = 0.95 exactly: kept
        2: " ".join(t[:20]),
        3: " ".join(t[20:38]),      # C ⊂ D, J = 18/19 ~ 0.947: out
        4: " ".join(t[20:39]),
    }
    df = pd.DataFrame(
        [(d, txt, "en", "s0") for d, txt in docs.items()],
        columns=["doc_id", "text", "lang", "source"],
    )
    df["n_chars"] = df.text.str.len().astype("int64")
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    got = {
        (r.d1, r.d2): (r.inter, r.n1, r.n2, r.jacc_ppm)
        for r in QUERIES["q_sim_setjoin_prefix"](spark, str(tmp_path)).collect()
    }
    sets = {d: set(txt.split(" ")) for d, txt in docs.items()}
    expect = {}
    for a in docs:
        for b in docs:
            if a >= b or len(sets[a]) < 10 or len(sets[b]) < 10:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * 20 >= union * 19:
                expect[(a, b)] = (
                    inter, len(sets[a]), len(sets[b]), inter * 1000000 // union
                )
    assert got == expect
    assert got[(1, 2)] == (19, 19, 20, 950000)   # exactly at tau: kept
    assert (3, 4) not in got                     # just below tau: out
