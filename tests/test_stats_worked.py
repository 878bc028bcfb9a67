"""Independent referents for the statistical-testing family
(operators/stats.py). The DuckDB oracles prove cross-engine agreement;
these prove the MATH against textbook formulas recomputed directly in
numpy/python over the same parquet — a statistic implemented identically
wrong on both engines would still pass the oracle, not these.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from recsys_spark_spark.registry import load_all
from tests.conftest import SF_SMOKE

QUERIES, _ = load_all()


@pytest.fixture(scope="module")
def seg_dollars(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    d = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    # half-away-from-zero, matching rlong/ROUND (pandas .round is half-even)
    d["x"] = np.floor(d.o_totalprice + 0.5).astype("int64")
    return d


def test_welch_ttest_matches_numpy(spark, seg_dollars):
    rows = {r.segment: r for r in QUERIES["q_stat_ttest"](spark, SF_SMOKE).collect()}
    d = seg_dollars
    for seg in d.c_mktsegment.unique():
        a = d.x[d.c_mktsegment == seg].to_numpy(dtype=float)
        b = d.x[d.c_mktsegment != seg].to_numpy(dtype=float)
        v1, v2 = a.var(ddof=1), b.var(ddof=1)
        se2 = v1 / len(a) + v2 / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(se2)
        df = se2**2 / ((v1 / len(a)) ** 2 / (len(a) - 1) + (v2 / len(b)) ** 2 / (len(b) - 1))
        r = rows[seg]
        assert (r.n_seg, r.n_rest) == (len(a), len(b))
        assert abs(r.t_stat - t) < 1e-5, (seg, r.t_stat, t)
        assert abs(r.df_welch - df) < 1e-4 * df, (seg, r.df_welch, df)


def test_chisq_total_matches_crosstab(spark, seg_dollars):
    got = QUERIES["q_stat_chisq"](spark, SF_SMOKE).toPandas()
    d = seg_dollars
    d["label"] = (d.o_orderpriority == "1-URGENT").astype(int)
    ct = pd.crosstab(d.c_mktsegment, d.label)
    exp = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / ct.values.sum()
    chi2 = float(((ct.values - exp) ** 2 / exp).sum())
    assert len(got) == ct.size
    assert abs(got.chi2_term.sum() - chi2) < 1e-6, (got.chi2_term.sum(), chi2)
    # df for the verdict: (R-1)(C-1)
    assert (ct.shape[0] - 1) * (ct.shape[1] - 1) == 4


def test_psi_matches_manual_binning(spark):
    got = QUERIES["q_drift_psi"](spark, SF_SMOKE).toPandas().set_index("bin")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    x = np.floor(o.o_totalprice + 0.5).astype("int64")
    assert (x >= 0).all()  # DIV-vs-floor guard: bin arithmetic assumes x >= 0
    is_ref = o.o_orderdate.dt.year < 1998
    mx = int(x.max())
    bins = np.minimum(9, (x * 10) // (mx + 1))
    want_psi = 0.0
    rn, cn = int(is_ref.sum()), int((~is_ref).sum())
    for b in sorted(bins.unique()):
        rc = int(((bins == b) & is_ref).sum())
        cc = int(((bins == b) & ~is_ref).sum())
        pr = (rc + 0.5) / (rn + 5.0)
        pc = (cc + 0.5) / (cn + 5.0)
        want_psi += (pc - pr) * math.log(pc / pr)
        assert (got.loc[b].ref_cnt, got.loc[b].cur_cnt) == (rc, cc)
    assert abs(got.psi_term.sum() - want_psi) < 1e-8


def test_gini_matches_numpy(spark, seg_dollars):
    row = QUERIES["q_gini_concentration"](spark, SF_SMOKE).collect()[0]
    d = seg_dollars
    rev = d.groupby("c_custkey").x.sum()
    all_cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas().c_custkey
    rev = rev.reindex(all_cust, fill_value=0).to_numpy(dtype="int64")
    xs = np.sort(rev)
    n = len(xs)
    want = 2.0 * float((np.arange(1, n + 1) * xs).sum()) / (n * float(xs.sum())) - (n + 1.0) / n
    assert row.n_customers == n
    assert row.total_rev == int(xs.sum())
    assert abs(row.gini - want) < 1e-8, (row.gini, want)
    assert 0.0 < row.gini < 1.0


def test_mann_kendall_matches_bruteforce(spark, seg_dollars):
    rows = {
        r.segment: r for r in QUERIES["q_stat_mann_kendall"](spark, SF_SMOKE).collect()
    }
    d = seg_dollars
    d["mon"] = d.o_orderdate.dt.to_period("M")
    monthly = d.groupby(["c_mktsegment", "mon"]).x.sum()
    for seg in d.c_mktsegment.unique():
        xs = monthly.loc[seg].sort_index().to_numpy(dtype="int64")
        n = len(xs)
        s = sum(
            int(np.sign(xs[j] - xs[i])) for i in range(n) for j in range(i + 1, n)
        )
        _, counts = np.unique(xs, return_counts=True)
        tie = sum(int(t * (t - 1) * (2 * t + 5)) for t in counts if t > 1)
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var) if s < 0 else 0.0
        r = rows[seg]
        assert (r.n_months, r.s_stat) == (n, s), seg
        assert abs(r.var_s - var) < 1e-6
        assert abs(r.z_stat - z) < 1e-5, (seg, r.z_stat, z)


def test_acf_matches_numpy_corrcoef(spark):
    """Each (type, lag) acf must equal np.corrcoef over the calendar-
    aligned pairs of the exact-cents daily series."""
    rows = {
        (r.event_type, r.lag_days): (r.n_pairs, r.acf)
        for r in QUERIES["q_ts_acf"](spark, SF_SMOKE).collect()
    }
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    e["day"] = e.ts.dt.normalize()
    e["cents"] = np.floor(e.value * 100 + 0.5).astype("int64")
    daily = e.groupby(["event_type", "day"]).cents.sum()
    for et in e.event_type.unique():
        s = daily.loc[et]
        for k in range(1, 8):
            shifted = s.copy()
            shifted.index = shifted.index - pd.Timedelta(days=k)
            joined = pd.concat([s.rename("x"), shifted.rename("y")], axis=1).dropna()
            want_n = len(joined)
            want_acf = float(np.corrcoef(joined.x, joined.y)[0, 1])
            n, acf = rows[(et, k)]
            assert n == want_n, (et, k)
            assert abs(acf - want_acf) < 1e-6, (et, k, acf, want_acf)


def test_feature_scale_matches_pandas_transform(spark):
    got = QUERIES["q_feature_scale"](spark, SF_SMOKE).toPandas()
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    c["cents"] = np.floor(c.c_acctbal * 100 + 0.5).astype("int64")
    g = c.groupby("c_mktsegment").cents
    z = (c.cents - g.transform("mean")) / g.transform("std")  # ddof=1
    mm = (c.cents - g.transform("min")) / (g.transform("max") - g.transform("min"))
    want = c.assign(mm_ppm=np.floor(mm * 1e6 + 0.5).astype("int64"))
    # half-away rounding for possibly-negative z
    want["z_ppm"] = [
        math.floor(v * 1e6 + 0.5) if v >= 0 else math.ceil(v * 1e6 - 0.5) for v in z
    ]
    m = got.set_index("c_custkey")
    for row in want.itertuples():
        r = m.loc[row.c_custkey]
        assert r.cents == row.cents
        assert abs(r.z_ppm - row.z_ppm) <= 1, row.c_custkey
        assert r.mm_ppm == row.mm_ppm, row.c_custkey


def test_benford_matches_manual_counts(spark):
    got = QUERIES["q_audit_benford"](spark, SF_SMOKE).toPandas().set_index("digit")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    dollars = np.floor(o.o_totalprice[o.o_totalprice > 0] + 0.5).astype("int64")
    first = dollars.astype(str).str[0].astype(int)
    n = len(first)
    chi2 = 0.0
    for d in range(1, 10):
        obs = int((first == d).sum())
        exp = math.log10(1 + 1 / d) * n
        if obs or d in got.index:
            assert got.loc[d].obs == obs, d
            assert abs(got.loc[d].expected - exp) < 1e-5, d
        chi2 += (obs - exp) ** 2 / exp
    assert abs(got.chi2_term.sum() - chi2) < 1e-6


def test_zipf_matches_polyfit(spark):
    row = QUERIES["q_text_zipf"](spark, SF_SMOKE).collect()[0]
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    from collections import Counter

    cnt = Counter()
    for t in docs.text:
        cnt.update(t.split(" "))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    x = np.log(np.arange(1, len(top) + 1))
    y = np.log([c for _, c in top])
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert row.n_terms == len(top)
    # engine points are micro-rounded pre-fit: allow that quantization
    assert abs(row.zipf_slope - slope) < 1e-4, (row.zipf_slope, slope)
    assert abs(row.zipf_intercept - intercept) < 1e-4
    assert abs(row.r2 - r * r) < 1e-4
    assert row.zipf_slope < 0  # frequency falls with rank


def test_cusum_matches_python_loop(spark):
    rows = {r.event_type: r for r in QUERIES["q_ts_cusum"](spark, SF_SMOKE).collect()}
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    e["day"] = e.ts.dt.normalize()
    e["cents"] = np.floor(e.value * 100 + 0.5).astype("int64")
    daily = e.groupby(["event_type", "day"]).cents.sum()
    for et in e.event_type.unique():
        s = daily.loc[et].sort_index()
        v = s.to_numpy(dtype="float64")
        m, sd = v.mean(), v.std(ddof=1)
        z = (v - m) / sd
        zu = np.array(
            [math.floor(x * 1e6 + 0.5) if x >= 0 else math.ceil(x * 1e6 - 0.5) for x in z],
            dtype="int64",
        )
        cu = np.cumsum(zu)
        peak_i = int(np.abs(cu).argmax())  # first occurrence = earliest day
        r = rows[et]
        assert r.n_days == len(v)
        assert r.peak_day == s.index[peak_i].strftime("%Y-%m-%d"), et
        assert abs(r.peak_cusum - cu[peak_i] / 1e6) < 2e-6, et


def test_twoprop_matches_manual(spark, seg_dollars):
    rows = {r.segment: r for r in QUERIES["q_stat_twoprop"](spark, SF_SMOKE).collect()}
    d = seg_dollars
    d["conv"] = (d.o_orderpriority == "1-URGENT").astype(int)
    for seg in d.c_mktsegment.unique():
        a, b = d.conv[d.c_mktsegment == seg], d.conv[d.c_mktsegment != seg]
        p1, p2 = a.mean(), b.mean()
        pp = d.conv.mean()
        z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / len(a) + 1 / len(b)))
        r = rows[seg]
        assert (r.n_seg, r.conv_seg) == (len(a), int(a.sum()))
        assert abs(r.z_stat - z) < 1e-5, (seg, r.z_stat, z)


def test_rfm_matches_pandas(spark):
    got = QUERIES["q_rfm_segmentation"](spark, SF_SMOKE).toPandas().set_index("c_custkey")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    o["day"] = o.o_orderdate.dt.normalize()
    o["dollars"] = np.floor(o.o_totalprice + 0.5).astype("int64")
    mx = o.day.max()
    base = o.groupby("o_custkey").agg(
        r_days=("day", lambda s: (mx - s.max()).days),
        f_orders=("o_orderkey", "size"),
        m_dollars=("dollars", "sum"),
    )
    n = len(base)
    for col, score, rev in (("r_days", "r_score", True), ("f_orders", "f_score", False), ("m_dollars", "m_score", False)):
        # explicit (value, custkey) total order
        ranked = base.reset_index().sort_values([col, "o_custkey"]).reset_index(drop=True)
        ranked["pos"] = ranked.index + 1
        ranked["tile"] = (ranked.pos - 1) * 5 // n + 1
        want = ranked.set_index("o_custkey").tile
        for ck, tile in want.items():
            expect = 6 - tile if rev else tile
            assert got.loc[ck][score] == expect, (col, ck)
    for ck, row in base.iterrows():
        g = got.loc[ck]
        assert (g.r_days, g.f_orders, g.m_dollars) == (
            row.r_days, row.f_orders, row.m_dollars
        ), ck


def test_graph_jaccard_matches_bruteforce(spark):
    """Full python recompute of the thresholded co-purchase graph and
    top-10 Jaccard link predictions at smoke SF."""
    from collections import defaultdict
    from itertools import combinations

    got = {}
    for r in QUERIES["q_graph_jaccard"](spark, SF_SMOKE).collect():
        got[(r.a, r.b)] = (r.n_common, r.jaccard, r.rnk)

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    ui = o.merge(l, left_on="o_orderkey", right_on="l_orderkey")[
        ["o_custkey", "l_partkey"]
    ].drop_duplicates()
    min_c = max(3, -(-ui.o_custkey.nunique() // 5000))
    pair_cnt = defaultdict(int)
    for _, grp in ui.groupby("o_custkey"):
        for x, y in combinations(sorted(grp.l_partkey.unique()), 2):
            pair_cnt[(x, y)] += 1
    edges = {p for p, c in pair_cnt.items() if c >= min_c}
    nbrs = defaultdict(set)
    for x, y in edges:
        nbrs[x].add(y)
        nbrs[y].add(x)
    cand = defaultdict(list)
    verts = sorted(nbrs)
    for i, a in enumerate(verts):
        for b in verts[i + 1:]:
            if (a, b) in edges:
                continue
            common = len(nbrs[a] & nbrs[b])
            if common >= 2:
                j = common / (len(nbrs[a]) + len(nbrs[b]) - common)
                cand[a].append((-j, b, common))
    want = {}
    for a, lst in cand.items():
        for rnk, (negj, b, common) in enumerate(sorted(lst)[:10], start=1):
            want[(a, b)] = (common, math.floor(-negj * 1e6 + 0.5) / 1e6, rnk)
    assert got == want


def test_part_abc_matches_pandas_cumsum(spark):
    got = QUERIES["q_part_abc"](spark, SF_SMOKE).toPandas().set_index("l_partkey")
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    cents = np.floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5).astype("int64")
    rev = cents.groupby(l.l_partkey).sum().reset_index(name="cents")
    rev = rev.sort_values(["cents", "l_partkey"], ascending=[False, True]).reset_index(drop=True)
    rev["run"] = rev.cents.cumsum()
    total = int(rev.cents.sum())
    for row in rev.itertuples():
        cls = "A" if row.run * 5 <= total * 4 else ("B" if row.run * 20 <= total * 19 else "C")
        g = got.loc[row.l_partkey]
        assert (g.cents, g.run, g.abc_class) == (row.cents, row.run, cls), row.l_partkey
    assert set(got.abc_class) == {"A", "B", "C"}


def test_global_running_sum_primitive(spark):
    """The distributed prefix sum must equal a single-partition cumsum on
    a hand-built frame whose values straddle many buckets."""
    from recsys_spark_spark.operators.sorts import global_running_sum

    rows = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r.k: r.run
        for r in global_running_sum(
            spark, df, value_col="v", tiebreak="k", descending=False
        ).collect()
    }
    run = 0
    for v, k in sorted((v, k) for k, v in rows):
        run += v
        assert got[k] == run, (k, v)


def test_price_elasticity_matches_polyfit(spark):
    rows = {r.p_brand: r for r in QUERIES["q_price_elasticity"](spark, SF_SMOKE).collect()}
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    p = spark.read.parquet(f"{SF_SMOKE}/part.parquet").toPandas()
    d = l.merge(p, left_on="l_partkey", right_on="p_partkey")
    d["x"] = np.floor(d.l_discount * 100 + 0.5).astype("int64")
    d["y"] = np.floor(d.l_quantity + 0.5).astype("int64")
    for brand, grp in d.groupby("p_brand"):
        slope, intercept = np.polyfit(grp.x, grp.y, 1)
        r = np.corrcoef(grp.x, grp.y)[0, 1]
        row = rows[brand]
        assert row.n_lines == len(grp)
        assert abs(row.slope_qty_per_pct - slope) < 1e-5, brand
        assert abs(row.intercept_qty - intercept) < 1e-5, brand
        assert abs(row.r2 - r * r) < 1e-5, brand


def test_seasonal_index_matches_manual(spark):
    got = {
        (r.event_type, r.dow): (r.n_days, r.seasonal_index)
        for r in QUERIES["q_seasonal_index"](spark, SF_SMOKE).collect()
    }
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    e["day"] = e.ts.dt.normalize()
    e["cents"] = np.floor(e.value * 100 + 0.5).astype("int64")
    daily = e.groupby(["event_type", "day"]).cents.sum().reset_index()
    # pandas dayofweek: Monday=0..Sunday=6 -> Sunday-0 convention
    daily["dow"] = (daily.day.dt.dayofweek + 1) % 7
    for et, grp in daily.groupby("event_type"):
        overall = grp.cents.mean()
        for dow, sub in grp.groupby("dow"):
            n, idx = got[(et, dow)]
            assert n == len(sub), (et, dow)
            assert abs(idx - sub.cents.mean() / overall) < 1e-6, (et, dow)
    # indices average ~1 weighted by day counts
    for et, grp in daily.groupby("event_type"):
        w = sum(got[(et, d)][0] * got[(et, d)][1] for d in grp.dow.unique())
        assert abs(w / grp.day.nunique() - 1.0) < 1e-3


def test_attribution_position_credits(spark):
    """Per-purchase invariants + python recompute of the U-shape: first
    and last get 400000 ppm (n>=3), middles split 200000, totals within
    n-2 ppm of 1e6; touch sets match a brute-force window scan."""
    import datetime as dt
    from collections import defaultdict

    got = defaultdict(list)
    for r in QUERIES["q_attribution_position"](spark, SF_SMOKE).collect():
        got[r.purchase_id].append(r)

    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    e["sec"] = e.ts.dt.floor("s")
    purchases = e[e.event_type == "purchase"]
    touches = e[e.event_type.isin(["view", "click"])]
    tby = dict(tuple(touches.groupby("user_id")))
    n_with = 0
    for p in purchases.itertuples():
        tu = tby.get(p.user_id)
        if tu is None:
            assert p.event_id not in got
            continue
        w = tu[
            ((tu.sec < p.sec) | ((tu.sec == p.sec) & (tu.event_id < p.event_id)))
            & (tu.sec >= p.sec - dt.timedelta(days=7))
        ].sort_values(["sec", "event_id"])
        if len(w) == 0:
            assert p.event_id not in got
            continue
        n_with += 1
        rows = sorted(got[p.event_id], key=lambda r: r.pos)
        assert [r.touch_id for r in rows] == list(w.event_id)
        n = len(rows)
        credits = [r.credit_ppm for r in rows]
        if n == 1:
            assert credits == [1_000_000]
        elif n == 2:
            assert credits == [500_000, 500_000]
        else:
            assert credits[0] == credits[-1] == 400_000
            mid = math.floor(200_000 / (n - 2) + 0.5)
            assert all(c == mid for c in credits[1:-1])
        assert abs(sum(credits) - 1_000_000) <= max(0, n - 2)
    assert n_with == len(got) > 0


def test_trending_items_matches_bruteforce(spark):
    got = [(r.l_partkey, r.n_sales, r.score, r.rnk) for r in
           QUERIES["q_trending_items"](spark, SF_SMOKE).collect()]
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    l["ship"] = l.l_shipdate.dt.normalize()
    mxd = l.ship.max()
    l["bkt"] = ((mxd - l.ship).dt.days // 180).astype("int64")
    bmax = int(l.bkt.max())
    l["wt"] = 2 ** (bmax - l.bkt)
    s = l.groupby("l_partkey").agg(n_sales=("wt", "size"), score=("wt", "sum"))
    ordered = s.reset_index().sort_values(["score", "l_partkey"], ascending=[False, True])
    want = [
        (int(r.l_partkey), int(r.n_sales), int(r.score), i + 1)
        for i, r in enumerate(ordered.head(20).itertuples(index=False))
    ]
    assert got == want


def test_purchase_cycle_matches_pandas(spark):
    got = {r.o_custkey: r for r in QUERIES["q_purchase_cycle"](spark, SF_SMOKE).collect()}
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    o["day"] = o.o_orderdate.dt.normalize()
    n_checked = 0
    for ck, grp in o.groupby("o_custkey"):
        days = grp.sort_values(["day", "o_orderkey"]).day
        gaps = days.diff().dt.days.dropna().astype(int)
        if len(gaps) == 0:
            assert ck not in got
            continue
        r = got[ck]
        n_checked += 1
        assert (r.n_gaps, r.min_gap_days, r.max_gap_days) == (
            len(gaps), gaps.min(), gaps.max()
        ), ck
        assert abs(r.mean_gap_days - gaps.mean()) < 1e-6, ck
    assert n_checked == len(got) > 0


def test_ks_matches_numpy_ecdf(spark):
    row = QUERIES["q_stat_ks"](spark, SF_SMOKE).collect()[0]
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    x = np.floor(o.o_totalprice + 0.5).astype("int64")
    ref = np.sort(x[o.o_orderdate.dt.year < 1998].to_numpy())
    cur = np.sort(x[o.o_orderdate.dt.year >= 1998].to_numpy())
    support = np.unique(np.concatenate([ref, cur]))
    f1 = np.searchsorted(ref, support, side="right") / len(ref)
    f2 = np.searchsorted(cur, support, side="right") / len(cur)
    d = np.abs(f1 - f2)
    i = int(d.argmax())  # first max = smallest x under ties
    assert (row.n_ref, row.n_cur) == (len(ref), len(cur))
    assert row.x_at_max == support[i]
    assert abs(row.ks_stat - d[i]) < 1e-9, (row.ks_stat, d[i])


def test_text_encode_matches_python(spark):
    got = {r.doc_id: r for r in QUERIES["q_text_encode"](spark, SF_SMOKE).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    from collections import Counter

    cnt = Counter()
    for t in docs.text:
        cnt.update(t.split(" "))
    vocab = {
        tok: i + 1
        for i, (tok, _) in enumerate(
            sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
        )
    }
    assert len(got) == len(docs)
    for row in docs.itertuples():
        toks = row.text.split(" ")
        ids = [vocab.get(t, 0) for t in toks]
        g = got[row.doc_id]
        assert g.n_tokens == len(toks), row.doc_id
        assert g.n_oov == sum(1 for i in ids if i == 0), row.doc_id
        assert g.ids == ",".join(map(str, ids)), row.doc_id


def test_source_text_roundtrip_preserves_lengths(spark):
    got = QUERIES["q_source_text"](spark, SF_SMOKE).toPandas()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    lens = docs.text.str.len()
    assert int(got.n_lines.sum()) == len(docs)
    assert int(got.total_chars.sum()) == int(lens.sum())
    want_buckets = (lens // 20).value_counts()
    for b, n in want_buckets.items():
        assert int(got.set_index("len_bucket").loc[b].n_lines) == n, b


def test_weighted_median_matches_python(spark):
    rows = {
        r.segment: r for r in QUERIES["q_agg_weighted_median"](spark, SF_SMOKE).collect()
    }
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    c["cents"] = np.floor(c.c_acctbal * 100 + 0.5).astype("int64")
    wt = o.groupby("o_custkey").size()
    c["wt"] = c.c_custkey.map(wt).fillna(0).astype(int)
    c = c[c.wt > 0]
    for seg, grp in c.groupby("c_mktsegment"):
        g = grp.sort_values(["cents", "c_custkey"])
        tot = int(g.wt.sum())
        cum = 0
        med = None
        for r in g.itertuples():
            prev = cum
            cum += r.wt
            if 2 * cum >= tot and 2 * prev < tot:
                med = r.cents
                break
        row = rows[seg]
        assert (row.n_weighted, row.totw, row.weighted_median_cents) == (
            len(g), tot, med
        ), seg


def test_survival_km_matches_python(spark):
    """Full python Kaplan-Meier recompute: risk sets, churn steps, and the
    survival product (exact product, no ln detour) per segment."""
    got = {}
    for r in QUERIES["q_survival_km"](spark, SF_SMOKE).collect():
        got[(r.segment, r.t_days)] = r
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    d = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    d["day"] = d.o_orderdate.dt.normalize()
    mxd = d.day.max()
    per = d.groupby(["o_custkey", "c_mktsegment"]).day.agg(["min", "max"]).reset_index()
    per["t"] = (per["max"] - per["min"]).dt.days
    per["churned"] = ((mxd - per["max"]).dt.days > 90).astype(int)
    n_rows = 0
    for seg, grp in per.groupby("c_mktsegment"):
        n_risk = len(grp)
        s = 1.0
        for t in sorted(grp.t.unique()):
            at_t = grp[grp.t == t]
            dd = int(at_t.churned.sum())
            if dd > 0:
                # mirror the engine's nano-rounded ln-sum only in tolerance
                s *= (n_risk - dd) / n_risk
                r = got[(seg, t)]
                n_rows += 1
                assert (r.n_churned, r.n_at_risk) == (dd, n_risk), (seg, t)
                assert abs(r.survival - s) < 5e-6, (seg, t, r.survival, s)
            else:
                assert (seg, t) not in got
            n_risk -= len(at_t)
        # the curve is monotone nonincreasing and ends above 0
        assert 0.0 < s <= 1.0
    assert n_rows == len(got) > 0


def test_embed_norm_audit_matches_numpy(spark):
    got = QUERIES["q_embed_norm_audit"](spark, SF_SMOKE).toPandas()
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").toPandas()
    rows = []
    for r in e.itertuples():
        v = np.asarray(r.embedding, dtype=np.float64)
        n2 = int(sum(int(math.floor(x * x * 1e12 + 0.5)) for x in v))
        norm = math.sqrt(n2 / 1e12)
        rows.append((r.label, len(v), int(norm * 10 // 1), n2 == 0, int((v == 0).sum()), norm))
    df = pd.DataFrame(rows, columns=["label", "dim", "bkt", "zero", "nze", "norm"])
    g = got.set_index(["label", "dim", "norm_decile_bucket"])
    for (lab, dim, bkt), grp in df.groupby(["label", "dim", "bkt"]):
        r = g.loc[(lab, dim, bkt)]
        assert r.n_vecs == len(grp)
        assert r.n_zero_vecs == int(grp.zero.sum())
        assert r.n_zero_elems == int(grp.nze.sum())
        assert abs(r.min_norm - grp.norm.min()) < 1e-6
        assert abs(r.max_norm - grp.norm.max()) < 1e-6
    assert len(got) == df.groupby(["label", "dim", "bkt"]).ngroups


def test_feature_store_composes_consistently(spark):
    """The wide table must agree column-for-column with the three source
    operators it composes, and cover exactly the customer base."""
    wide = QUERIES["q_feature_store"](spark, SF_SMOKE).toPandas().set_index("c_custkey")
    scale = QUERIES["q_feature_scale"](spark, SF_SMOKE).toPandas().set_index("c_custkey")
    rfm = QUERIES["q_rfm_segmentation"](spark, SF_SMOKE).toPandas().set_index("c_custkey")
    cyc = QUERIES["q_purchase_cycle"](spark, SF_SMOKE).toPandas().set_index("o_custkey")
    assert set(wide.index) == set(scale.index)
    for ck, row in wide.iterrows():
        s = scale.loc[ck]
        assert (row.segment, row.cents, row.z_ppm, row.mm_ppm) == (
            s.segment, s.cents, s.z_ppm, s.mm_ppm
        )
        if ck in rfm.index:
            r = rfm.loc[ck]
            assert (row.r_score, row.f_score, row.m_score) == (
                r.r_score, r.f_score, r.m_score
            )
        else:
            assert pd.isna(row.r_score)
        if ck in cyc.index:
            assert abs(row.mean_gap_days - cyc.loc[ck].mean_gap_days) < 1e-9
        else:
            assert pd.isna(row.mean_gap_days)


def test_pvalue_matches_scipy_free_referent(spark):
    """p-values must match an independent python normal-CDF (math.erfc)
    within the A&S polynomial's documented 7.5e-8 error, and the verdicts
    must equal recomputed z-test decisions."""
    rows = {r.segment: r for r in QUERIES["q_stat_pvalue"](spark, SF_SMOKE).collect()}
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    d = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    d["conv"] = (d.o_orderpriority == "1-URGENT").astype(int)
    pp = d.conv.mean()
    for seg in d.c_mktsegment.unique():
        a, b = d.conv[d.c_mktsegment == seg], d.conv[d.c_mktsegment != seg]
        z = (a.mean() - b.mean()) / math.sqrt(
            pp * (1 - pp) * (1 / len(a) + 1 / len(b))
        )
        p = math.erfc(abs(z) / math.sqrt(2))  # exact two-sided normal p
        r = rows[seg]
        assert abs(r.z_stat - z) < 1e-5, seg
        assert abs(r.p_two_sided - p) < 2e-7, (seg, r.p_two_sided, p)
        assert r.significant == int(p < 0.05), seg
        assert r.significant_bonferroni == int(p * 5 < 0.05), seg


def test_anova_matches_numpy(spark, seg_dollars):
    row = QUERIES["q_stat_anova"](spark, SF_SMOKE).collect()[0]
    d = seg_dollars
    groups = [g.x.to_numpy(dtype=float) for _, g in d.groupby("c_mktsegment")]
    allx = d.x.to_numpy(dtype=float)
    ssb = sum(len(g) * (g.mean() - allx.mean()) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(allx)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (row.k_groups, row.n_total, row.df_between, row.df_within) == (
        k, n, k - 1, n - k
    )
    assert abs(row.f_stat - f) < 1e-4, (row.f_stat, f)
    assert abs(row.eta_squared - ssb / (ssb + ssw)) < 1e-6


def test_diversity_entropy_matches_numpy(spark):
    rows = {r.nationkey: r for r in
            QUERIES["q_agg_diversity_entropy"](spark, SF_SMOKE).collect()}
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    for nk, grp in c.groupby("c_nationkey"):
        p = grp.c_mktsegment.value_counts(normalize=True).to_numpy()
        h = float(-(p * np.log(p)).sum())
        r = rows[nk]
        assert r.n_customers == len(grp) and r.k_segments == len(p)
        assert abs(r.entropy_nats - h) < 1e-5
        want_norm = 0.0 if len(p) == 1 else h / math.log(len(p))
        assert abs(r.entropy_norm - want_norm) < 1e-5
        assert abs(r.effective_segments - math.exp(h)) < 1e-4
        # Hill-number sanity: 1 <= exp(H) <= k
        assert 1.0 - 1e-9 <= r.effective_segments <= len(p) + 1e-9


def test_session_paths_matches_python(spark):
    got = [(r.path, r.n_sessions, r.rnk) for r in
           QUERIES["q_session_paths"](spark, SF_SMOKE).collect()]
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    from collections import Counter

    cnt = Counter()
    for _, grp in e.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        prev, path = None, []
        paths = []
        for r in g.itertuples():
            if prev is not None and (r.ts - prev).total_seconds() <= 1800:
                path.append(r.event_type)
            else:
                if path:
                    paths.append(path)
                path = [r.event_type]
            prev = r.ts
        paths.append(path)
        for p in paths:
            cnt[">".join(p[:8])] += 1
    want = [
        (p, n, i + 1)
        for i, (p, n) in enumerate(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20])
    ]
    assert got == want


def test_forecast_linear_matches_polyfit(spark):
    rows = {r.event_type: r for r in
            QUERIES["q_forecast_linear"](spark, SF_SMOKE).collect()}
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    e["day"] = e.ts.dt.normalize()
    e["cents"] = np.floor(e.value * 100 + 0.5).astype("int64")
    daily = e.groupby(["event_type", "day"]).cents.sum().reset_index()
    for et, grp in daily.groupby("event_type"):
        t = (grp.day - grp.day.min()).dt.days.to_numpy(dtype=float)
        slope, icept = np.polyfit(t, grp.cents.to_numpy(dtype=float), 1)
        r = rows[et]
        assert r.n_days == len(grp)
        assert abs(r.slope_cents_per_day - slope) < 1e-3 * max(1, abs(slope)), et
        assert abs(r.intercept_cents - icept) < 1e-5 * max(1, abs(icept)), et
        want_fc = icept + slope * (t.max() + 7)
        assert abs(r.forecast_cents - want_fc) < 1e-5 * max(1, abs(want_fc)), et


def test_winsorize_matches_numpy_quantiles(spark):
    got = QUERIES["q_feature_winsorize"](spark, SF_SMOKE).toPandas().set_index("c_custkey")
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    c["cents"] = np.floor(c.c_acctbal * 100 + 0.5).astype("int64")
    n_clamped = 0
    for seg, grp in c.groupby("c_mktsegment"):
        xs = grp.sort_values(["cents", "c_custkey"]).cents.to_numpy()
        n = len(xs)
        lo = int(xs[math.ceil(n * 5 / 100) - 1])
        hi = int(xs[math.ceil(n * 95 / 100) - 1])
        for r in grp.itertuples():
            g = got.loc[r.c_custkey]
            assert (g.lo, g.hi) == (lo, hi), seg
            want = min(max(r.cents, lo), hi)
            assert g.cents_winsorized == want, r.c_custkey
            assert g.is_clamped == int(r.cents < lo or r.cents > hi)
            n_clamped += int(g.is_clamped)
    assert 0 < n_clamped < len(c) * 0.12  # ~10% of rows clamp at 5/95


def test_bootstrap_ci_matches_replicates(spark):
    """CI must equal a direct recompute over the registered bootstrap's
    own replicate output (cent-quantized), and the envelope must bracket
    the truth reasonably."""
    row = QUERIES["q_stat_bootstrap_ci"](spark, SF_SMOKE).collect()[0]
    reps = QUERIES["q_sample_bootstrap"](spark, SF_SMOKE).toPandas()
    mc = np.array([math.floor(v * 100 + 0.5) for v in reps.mean_total], dtype="int64")
    mean = mc.mean() / 100
    se = mc.std(ddof=1) / 100
    z = 1.959963984540054
    assert row.n_replicates == len(mc)
    assert abs(row.boot_mean - mean) < 1e-5
    assert abs(row.boot_se - se) < 1e-5
    assert abs(row.ci95_lo - (mean - z * se)) < 1e-4
    assert abs(row.ci95_hi - (mean + z * se)) < 1e-4
    assert row.rep_min <= row.boot_mean <= row.rep_max
    truth = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas().o_totalprice.mean()
    assert row.ci95_lo < truth < row.ci95_hi


def test_dq_expectations_all_pass_on_clean_fixtures(spark):
    """The synthetic fixtures are clean by construction: every rule must
    check a positive row count and fail zero rows — and the rule set
    must cover the four tables."""
    got = QUERIES["q_dq_expectations"](spark, SF_SMOKE).toPandas()
    assert len(got) == 8
    assert set(got.tbl) == {"orders", "lineitem", "customer", "events"}
    assert (got.n_checked > 0).all()
    assert (got.n_failed == 0).all(), got[got.n_failed > 0]


def test_novelty_matches_python(spark):
    """Per-user novelty must equal -mean ln(item share) recomputed in
    python over the flagship's own recommendations."""
    rows = {r.user_id: r for r in QUERIES["q_eval_novelty"](spark, SF_SMOKE).collect()}
    recs = QUERIES["q_cf_recommend"](spark, SF_SMOKE).toPandas()
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    ui = o.merge(l, left_on="o_orderkey", right_on="l_orderkey")[
        ["o_custkey", "l_partkey"]
    ].drop_duplicates()
    cnt = ui.groupby("l_partkey").o_custkey.nunique()
    tot = int(cnt.sum())
    assert set(rows) == set(recs.user_id)
    for uid, grp in recs.groupby("user_id"):
        nov = np.mean([-math.log(cnt[i] / tot) for i in grp.item_id])
        r = rows[uid]
        assert r.n_recs == len(grp)
        assert abs(r.mean_novelty - nov) < 1e-5, (uid, r.mean_novelty, nov)


def test_readability_matches_python(spark):
    import re

    got = {r.doc_id: r for r in QUERIES["q_text_readability"](spark, SF_SMOKE).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    assert len(got) == len(docs)
    for row in docs.itertuples():
        s = max(len(re.findall(r"[.!?]+", row.text)), 1)
        w = len(row.text.split(" "))
        y = max(len(re.findall(r"[aeiouyAEIOUY]+", row.text)), 1)
        score = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        r = got[row.doc_id]
        assert (r.n_sents, r.n_words, r.n_syll) == (s, w, y), row.doc_id
        assert abs(r.flesch_score - score) < 1e-5, row.doc_id


def test_mannwhitney_matches_numpy_ranksum(spark):
    """Textbook U with average ranks + tie-corrected variance, recomputed
    over pooled scipy-free numpy ranks."""
    from recsys_spark_spark.operators.stats import MWU_GROUP_A, MWU_GROUP_B

    got = QUERIES["q_stat_mannwhitney"](spark, SF_SMOKE).collect()[0]
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    o = o[o.o_orderpriority.isin([MWU_GROUP_A, MWU_GROUP_B])]
    x = np.floor(o.o_totalprice + 0.5).astype("int64").to_numpy()
    g1 = (o.o_orderpriority == MWU_GROUP_A).to_numpy()
    ranks = pd.Series(x).rank(method="average").to_numpy()  # avg ranks w/ ties
    n1, n = int(g1.sum()), len(x)
    n2 = n - n1
    r1 = float(ranks[g1].sum())
    u1 = r1 - n1 * (n1 + 1) / 2
    _, t = np.unique(x, return_counts=True)
    tie = float((t**3 - t).sum())
    var = (n1 * n2 / 12) * ((n + 1) - tie / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / math.sqrt(var)
    assert (got.n_a, got.n_b) == (n1, n2)
    assert abs(got.u_stat - u1) < 1e-6, (got.u_stat, u1)
    assert abs(got.z_stat - z) < 1e-5, (got.z_stat, z)


def test_glm_newton_matches_numpy_irls(spark):
    """The K-step Newton iteration recomputed in numpy from the same rows
    (same quantization) must land on the same betas; ALSO check the
    unquantized textbook iteration agrees to ~1e-5 (the quantization is a
    determinism device, not a semantics change)."""
    from recsys_spark_spark.operators.stats import GLM_STEPS, _GLM_Q

    got = QUERIES["q_glm_logistic_newton"](spark, SF_SMOKE).collect()[0]
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    y = (li.l_returnflag == "R").astype(float).to_numpy()
    x = (np.floor(li.l_discount * 100 + 0.5) / 100).to_numpy()

    def newton(quantize: bool):
        b0 = b1 = 0.0
        for _ in range(GLM_STEPS):
            mu = 1.0 / (1.0 + np.exp(-(b0 + b1 * x)))
            w = mu * (1 - mu)
            qs = (
                (lambda v: np.floor(v * _GLM_Q + 0.5).sum() / _GLM_Q)
                if quantize
                else (lambda v: v.sum())
            )
            g0, g1 = qs(y - mu), qs((y - mu) * x)
            h00, h01, h11 = qs(w), qs(w * x), qs(w * x * x)
            det = h00 * h11 - h01 * h01
            b0 += (h11 * g0 - h01 * g1) / det
            b1 += (h00 * g1 - h01 * g0) / det
        return b0, b1
    qb0, qb1 = newton(True)
    tb0, tb1 = newton(False)
    assert abs(got.beta_intercept - qb0) < 2e-6, (got.beta_intercept, qb0)
    assert abs(got.beta_discount - qb1) < 2e-6, (got.beta_discount, qb1)
    assert abs(qb0 - tb0) < 1e-5 and abs(qb1 - tb1) < 1e-5  # quantization inert


def test_covariance_matrix_matches_numpy(spark):
    got = QUERIES["q_feature_covariance"](spark, SF_SMOKE).toPandas()
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    from recsys_spark_spark.operators.stats import COV_FEATS

    cols = {nm: np.floor(li[src] * 100 + 0.5) / 100 for nm, src in COV_FEATS}
    for row in got.itertuples():
        a, b = cols[row.feat_x].to_numpy(), cols[row.feat_y].to_numpy()
        cov = float(np.mean(a * b) - a.mean() * b.mean())
        corr = cov / math.sqrt(
            (np.mean(a * a) - a.mean() ** 2) * (np.mean(b * b) - b.mean() ** 2)
        )
        assert abs(row.cov_pop - cov) < max(5e-3, 1e-9 * abs(cov)), (row, cov)
        assert abs(row.corr - corr) < 1e-5, (row, corr)


def test_covariance_no_negative_zero_bits(spark):
    """Round-6 driver-red regression pin. The old query emitted its display
    values through DOUBLE closed forms: DuckDB ROUND(double) returns -0.0
    for tiny negatives (cov(qty,disc) = -7.6e-4 at sf0.01 → -0.0) while
    Spark's long-typed rlong returns +0.0 — equal by VALUE, different
    BYTES, so the driver's byte-level hash went red while every value-level
    compare stayed green. The exact-integer rebuild must emit no -0.0 bit
    pattern on EITHER engine, at the driver's SF where the offending value
    exists."""
    import struct

    import duckdb

    _, oracles = load_all()
    sf = "/root/testdata/sf0.01"
    neg_zero = struct.pack("<d", -0.0)
    sdf = QUERIES["q_feature_covariance"](spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    odf = con.execute(oracles["q_feature_covariance"]).fetchdf()
    # the hazard must actually be exercised: a value that rounds to zero
    assert ((sdf.cov_pop == 0) & (sdf.feat_x != sdf.feat_y)).any()
    for eng, df in (("spark", sdf), ("duckdb", odf)):
        for c in ("cov_pop", "corr"):
            for v in df[c]:
                assert struct.pack("<d", float(v)) != neg_zero, (eng, c, v)


def test_eigencentrality_matches_numpy_power_iteration(spark):
    """The unrolled normalized power iteration recomputed densely in numpy
    (same per-step integer re-quantization) must reproduce the top-k
    EXACTLY; and the quantized result must be within vector-noise of the
    unquantized textbook iteration."""
    from recsys_spark_spark.operators.analytics import EIG_ITERS, EIG_SCALE, EIG_TOP

    got = QUERIES["q_graph_eigencentrality"](spark, SF_SMOKE).toPandas()
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")[["o_orderkey", "o_custkey"]]
    l = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    ui = o.merge(l, left_on="o_orderkey", right_on="l_orderkey")[
        ["o_custkey", "l_partkey"]
    ].drop_duplicates()
    e = ui.merge(ui, on="o_custkey")
    e = e[e.l_partkey_x != e.l_partkey_y]
    w = e.groupby(["l_partkey_x", "l_partkey_y"]).size()
    nodes = sorted(set(w.index.get_level_values(0)))
    idx = {n: k for k, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for (i, j), c in w.items():
        A[idx[i], idx[j]] = c
    v = np.full(len(nodes), EIG_SCALE)
    for _ in range(EIG_ITERS):
        wv = A @ v
        v = np.floor(wv / math.sqrt((wv * wv).sum()) * EIG_SCALE + 0.5)
    order = np.lexsort((nodes, -v))[:EIG_TOP]
    for rnk, k in enumerate(order, start=1):
        row = got[got.rnk == rnk].iloc[0]
        assert row.item_id == nodes[k], (rnk, row.item_id, nodes[k])
        assert abs(row.centrality - v[k] / EIG_SCALE) < 1e-9


def test_linreg_multi_matches_numpy_lstsq(spark):
    """q_stat_linreg_multi's 3×3 Cramer solve vs np.linalg.lstsq on the
    identically-quantized design matrix (quantity, discount-pct → price
    cents). lstsq solves the same normal equations by SVD, so agreement to
    ~1e-6 relative validates both the sufficient statistics and the
    determinant algebra."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    x1 = np.floor(li.l_quantity + 0.5).astype("int64").to_numpy(dtype=float)
    x2 = np.floor(li.l_discount * 100 + 0.5).astype("int64").to_numpy(dtype=float)
    y = np.floor(li.l_extendedprice * 100 + 0.5).astype("int64").to_numpy(dtype=float)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    row = QUERIES["q_stat_linreg_multi"](spark, SF_SMOKE).first()
    assert row.n_rows == len(li)
    got = (row.beta_intercept_cents, row.beta_qty_cents, row.beta_discpct_cents)
    for g, ref in zip(got, beta):
        assert abs(g - ref) <= max(1e-6 * abs(ref), 1e-3), (got, beta)


def _avg_ranks(v: np.ndarray) -> np.ndarray:
    """Average ranks with ties (1-based), scipy-free."""
    order = np.argsort(v, kind="mergesort")
    ranks = np.empty(len(v), dtype=float)
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


def test_spearman_matches_numpy(spark):
    row = QUERIES["q_stat_spearman"](spark, SF_SMOKE).collect()[0]
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    spend = (
        np.floor(o.o_totalprice + 0.5).astype("int64").groupby(o.o_custkey).sum()
    )
    x = np.floor(c.c_acctbal + 0.5).astype("int64").to_numpy()
    y = c.c_custkey.map(spend).fillna(0).astype("int64").to_numpy()
    rx, ry = _avg_ranks(x), _avg_ranks(y)
    rho = float(np.corrcoef(rx, ry)[0, 1])
    n = len(x)
    zf = 0.5 * math.log((1 + rho) / (1 - rho)) * math.sqrt(n - 3)
    p = math.erfc(abs(zf) / math.sqrt(2))
    assert row.n_customers == n
    assert abs(row.spearman_rho - rho) < 1e-6, (row.spearman_rho, rho)
    assert abs(row.fisher_z - zf) < 1e-4, (row.fisher_z, zf)
    assert abs(row.p_two_sided - p) < 2e-7, (row.p_two_sided, p)


def test_kruskal_matches_numpy(spark):
    row = QUERIES["q_stat_kruskal"](spark, SF_SMOKE).collect()[0]
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    x = np.floor(o.o_totalprice + 0.5).astype("int64").to_numpy()
    g = o.o_orderpriority.to_numpy()
    ranks = _avg_ranks(x)
    n = len(x)
    rsum = 0.0
    for grp in np.unique(g):
        rg = ranks[g == grp]
        rsum += rg.sum() ** 2 / len(rg)
    h = 12.0 / (n * (n + 1)) * rsum - 3 * (n + 1)
    _, counts = np.unique(x, return_counts=True)
    cc = 1 - float((counts.astype(float) ** 3 - counts).sum()) / (
        float(n) ** 3 - n
    )
    h_adj = h / cc
    p = math.exp(-h_adj / 2) * (1 + h_adj / 2)  # chi2 sf, df=4 closed form
    assert (row.k_groups, row.n_total) == (5, n)
    assert abs(row.h_stat - h) < 1e-4, (row.h_stat, h)
    assert abs(row.h_adj - h_adj) < 1e-4, (row.h_adj, h_adj)
    # the unit-integer pre-sum quantizes H by ~1e-5 at this SF; through
    # the chi2 density that is ~1e-7 in p — both engines share it exactly
    assert abs(row.p_value - p) < 1e-6, (row.p_value, p)
