"""Property-based CF checks — Spark chain vs an independent pure-Python
reference on hypothesis-generated interaction matrices.

The DuckDB oracles prove parity on the fixture data; these prove the CF
*logic* on adversarial shapes the fixtures don't contain: similarity ties,
single-user corpora, items seen by everyone, users with one item. The
reference implementation shares only the arithmetic contract (multiply-form
half-away rounding, scaled-integer sums) — not the code.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from recsys_spark_spark.cf import itemcf

K = 10
N = 5


def _rnd(v: float) -> int:
    """Half-away-from-zero to int — the Python twin of determinism.rlong."""
    return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)


def ref_neighbors(pairs: set[tuple[int, int]]) -> dict[tuple[int, int], float]:
    users: dict[int, set[int]] = defaultdict(set)
    for u, i in pairs:
        users[u].add(i)
    n_users: dict[int, int] = defaultdict(int)
    for its in users.values():
        for i in its:
            n_users[i] += 1
    cnt: dict[tuple[int, int], int] = defaultdict(int)
    for its in users.values():
        for a in its:
            for b in its:
                if a != b:
                    cnt[(a, b)] += 1
    sims = {
        (a, b): _rnd(c / math.sqrt(n_users[a] * n_users[b]) * 1e6) / 1e6
        for (a, b), c in cnt.items()
    }
    out: dict[tuple[int, int], float] = {}
    by_a: dict[int, list[tuple[float, int]]] = defaultdict(list)
    for (a, b), s in sims.items():
        by_a[a].append((-s, b))
    for a, cand in by_a.items():
        for rank, (neg_s, b) in enumerate(sorted(cand)[:K], 1):
            out[(a, b)] = -neg_s
    return out


def ref_recommend(pairs: set[tuple[int, int]]) -> dict[tuple[int, int], float]:
    users: dict[int, set[int]] = defaultdict(set)
    for u, i in pairs:
        users[u].add(i)
    nb = ref_neighbors(pairs)
    scores: dict[tuple[int, int], int] = defaultdict(int)
    for u, its in users.items():
        for i in its:
            for (a, j), s in nb.items():
                if a == i:
                    scores[(u, j)] += _rnd(s * 1 * 1e6)  # cnt == 1 in these fixtures
    out: dict[tuple[int, int], float] = {}
    by_u: dict[int, list[tuple[float, int]]] = defaultdict(list)
    for (u, j), sc in scores.items():
        if j not in users[u]:
            by_u[u].append((-(sc / 1e6), j))
    for u, cand in by_u.items():
        for rank, (neg_s, j) in enumerate(sorted(cand)[:N], 1):
            out[(u, j)] = _rnd(-neg_s * 1e6) / 1e6
    return out


@st.composite
def interaction_sets(draw):
    pairs = draw(
        st.sets(
            st.tuples(st.integers(1, 6), st.integers(1, 8)),
            min_size=2,
            max_size=30,
        )
    )
    return pairs


@pytest.fixture(scope="module")
def spark_df(spark):
    def mk(pairs):
        rows = [(u, i, 1, 1.0) for u, i in sorted(pairs)]
        return spark.createDataFrame(
            rows, "user_id long, item_id long, cnt long, total_qty double"
        )

    return mk


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=interaction_sets())
def test_fused_neighbors_match_reference(spark, spark_df, pairs):
    ui = spark_df(pairs)
    got = {
        (r.item_i, r.item_j): r.sim
        for r in itemcf.topk_neighbors_fused(ui, itemcf.item_norms(ui), k=K).collect()
    }
    assert got == ref_neighbors(pairs)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=interaction_sets())
def test_recommend_matches_reference(spark, spark_df, pairs):
    ui = spark_df(pairs)
    nb = itemcf.topk_neighbors_fused(ui, itemcf.item_norms(ui), k=K).select(
        "item_i", "item_j", "sim"
    )
    got = {(r.user_id, r.item_id): r.score for r in itemcf.recommend(ui, nb, n=N).collect()}
    want = ref_recommend(pairs)
    assert got == want
    # invariant: nothing recommended was already seen
    assert all((u, i) not in pairs for (u, i) in got)


def _uf_components(edges: set[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(st.integers(1, 12), st.integers(1, 12)).filter(lambda e: e[0] < e[1]),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_match_union_find(spark, edges):
    from recsys_spark_spark.llm.dedup import connected_components

    df = spark.createDataFrame(sorted(edges), "d1 long, d2 long")
    got = {r.doc_id: r.cluster for r in connected_components(df).collect()}
    assert got == _uf_components(edges)


def test_connected_components_raises_on_non_convergence(spark):
    """A chain's diameter exceeding max_rounds must be an error, not silently
    wrong labels (ADVICE round 2)."""
    import pytest

    from recsys_spark_spark.llm.dedup import connected_components

    chain = [(i, i + 1) for i in range(1, 9)]  # diameter 8
    df = spark.createDataFrame(chain, "d1 long, d2 long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=2)
    # and with an adequate bound the same chain converges to one cluster
    labels = {r.doc_id: r.cluster for r in connected_components(df, max_rounds=10).collect()}
    assert set(labels.values()) == {1}


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_user_history_below_cap_on_fixtures(spark, sf_dir):
    """The CF oracles — and, since round 6, the graph edge builders behind
    q_graph_pagerank / q_graph_eigencentrality (analytics._pr_edges /
    _eig_edges, both built from capped_interactions), and since round 8 the
    history_capped_edges pair guard inside q_cf_incremental_cooc — assume
    capped == uncapped interactions, which holds only while no user's
    distinct item count reaches MAX_USER_HISTORY. Guard that assumption per
    fixture — at EVERY oracle-compared SF — so a regenerated/denser testdata
    set fails loudly here instead of silently diverging from the uncapped
    SQL oracles (ADVICE round 3; sf0.1 added round 8)."""
    from pyspark.sql import functions as F

    ui = itemcf.interactions(spark, sf_dir)
    max_hist = ui.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert max_hist < itemcf.MAX_USER_HISTORY, (
        f"{sf_dir}: a user has {max_hist} distinct items >= cap "
        f"{itemcf.MAX_USER_HISTORY}; capped CF oracles are no longer exact"
    )


def test_negative_samples_disjoint_from_seen(spark):
    """Beyond oracle parity: no sampled negative may collide with ANY item
    its user interacted with, and each user gets at most NEG_K distinct
    negatives."""
    from recsys_spark_spark.registry import load_all

    QUERIES, _ = load_all()
    from pyspark.sql import functions as F

    from recsys_spark_spark.catalog import table
    from recsys_spark_spark.llm.sampling import NEG_K
    from tests.conftest import SF_SMOKE

    neg = QUERIES["q_sample_negatives"](spark, SF_SMOKE)
    o = table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    seen = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("neg_item")
        )
        .distinct()
    )
    assert neg.join(seen, ["user_id", "neg_item"]).count() == 0
    per_user = neg.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert per_user <= NEG_K


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_item_audience_below_cap_on_fixtures(spark, sf_dir):
    """The UserCF oracles assume audience-capped == uncapped pair
    generation (q_cf_user_sim / topk_user_neighbors ride audience_capped
    since round 7), which holds only while no item's audience reaches
    MAX_ITEM_AUDIENCE. Guard it per fixture — the mirror of the
    MAX_USER_HISTORY guard above, at EVERY oracle-compared SF (ADVICE r7:
    sf0.1 was previously covered only indirectly via the full oracle sweep;
    max audiences are 39/49/53, so the r8 cap of 64 still clears all three
    with headroom)."""
    from pyspark.sql import functions as F

    ui = itemcf.interactions(spark, sf_dir)
    max_aud = ui.groupBy("item_id").count().agg(F.max("count")).first()[0]
    assert max_aud < itemcf.MAX_ITEM_AUDIENCE, (
        f"{sf_dir}: an item has {max_aud} users >= cap "
        f"{itemcf.MAX_ITEM_AUDIENCE}; capped UserCF oracles are no longer exact"
    )


def test_audience_cap_keeps_smallest_user_ids(spark):
    """audience_capped must keep exactly the `cap` SMALLEST user_ids per
    item (the deterministic production-sampling stand-in, same discipline
    as Swing's per-item cap) and leave small-audience items untouched."""
    rows = [(u, 1, 1, 1.0) for u in range(10, 20)] + [(11, 2, 1, 1.0), (13, 2, 1, 1.0)]
    ui = spark.createDataFrame(rows, "user_id long, item_id long, cnt long, total_qty double")
    got = {
        (r.item_id, r.user_id)
        for r in itemcf.audience_capped(ui, cap=4).collect()
    }
    expect = {(1, u) for u in (10, 11, 12, 13)} | {(2, 11), (2, 13)}
    assert got == expect


def test_history_cap_keeps_earliest_edges(spark):
    """history_capped_edges must keep exactly the `cap` EARLIEST (m, i)
    edges per user (the incremental contract: a standing capped history
    admits new edges only while under budget) and leave small-history users
    untouched — the r8 pair-mass guard inside q_cf_incremental_cooc."""
    import datetime as dt

    from recsys_spark_spark.cf.itemcf import history_capped_edges

    d = dt.date(1995, 1, 1)
    rows = [(1, i, d + dt.timedelta(days=i)) for i in range(10)]
    # ties on m broken by item id: items 100..104 all first-seen the same day
    rows += [(2, 100 + i, d) for i in range(5)]
    fs = spark.createDataFrame(rows, "u long, i long, m date")
    got = {(r.u, r.i) for r in history_capped_edges(fs, cap=4).collect()}
    expect = {(1, i) for i in range(4)} | {(2, 100 + i) for i in range(4)}
    assert got == expect


def test_audience_cap_saturation_bounds_pair_mass(spark):
    """The flat-region demonstration behind the r8 cap (VERDICT r7 #2):
    with item audiences FAR above MAX_ITEM_AUDIENCE, the capped pair-join
    input carries exactly `cap` rows per item — so directional pair mass is
    cap² per item NO MATTER how hot the item gets (500 and 5000 users
    produce identical pair-stage work). The sf1 probe measured the wall
    consequence (31.4x -> 1.97x); this pins the structural cause."""
    from pyspark.sql import functions as F

    for audience in (500, 5000):
        rows = [(u, 1, 1, 1.0) for u in range(audience)]
        ui = spark.createDataFrame(
            rows, "user_id long, item_id long, cnt long, total_qty double"
        )
        capped = itemcf.audience_capped(ui)
        per_item = capped.groupBy("item_id").count().collect()
        assert all(r["count"] == itemcf.MAX_ITEM_AUDIENCE for r in per_item)
        # pair mass of the capped self-join is exactly cap*(cap-1) directional
        a = capped.select("item_id", F.col("user_id").alias("user_a"))
        b = capped.select("item_id", F.col("user_id").alias("user_b"))
        n_pairs = a.join(b, "item_id").where(F.col("user_a") != F.col("user_b")).count()
        assert n_pairs == itemcf.MAX_ITEM_AUDIENCE * (itemcf.MAX_ITEM_AUDIENCE - 1)


def test_history_cap_saturation_bounds_pair_mass(spark):
    """The MAX_USER_HISTORY twin of the audience-cap saturation test
    (VERDICT r8 #6): with user histories FAR above the cap, the capped
    edge table carries exactly `cap` earliest edges per user — so the
    incremental co-occurrence self-join's per-user pair mass is cap·(cap-1)
    NO MATTER how deep the whale's history runs (1,500 and 3,000 edges
    produce identical pair-stage work). Run with a small cap so the test is
    fast; the production constant only moves the plateau, not its existence."""
    import datetime as dt

    from pyspark.sql import functions as F

    from recsys_spark_spark.cf.itemcf import history_capped_edges

    cap = 40
    d = dt.date(1995, 1, 1)
    for history in (1_500, 3_000):
        rows = [(7, i, d + dt.timedelta(days=i)) for i in range(history)]
        fs = spark.createDataFrame(rows, "u long, i long, m date")
        capped = history_capped_edges(fs, cap=cap)
        assert capped.count() == cap
        a = capped.select("u", F.col("i").alias("pi"))
        b = capped.select("u", F.col("i").alias("pj"))
        n_pairs = a.join(b, "u").where(F.col("pi") != F.col("pj")).count()
        assert n_pairs == cap * (cap - 1)
        # earliest-first: the kept edges are exactly the cap smallest (m, i)
        kept = {r.i for r in capped.collect()}
        assert kept == set(range(cap))


def test_cap_guard_catches_saturated_data(spark, tmp_path):
    """capped == uncapped is an ASSERTED property, not an assumption
    (VERDICT r8 #6): the sweep harness's _assert_cap_properties must fail
    loudly on data where an item's audience reaches MAX_ITEM_AUDIENCE or a
    user's history reaches MAX_USER_HISTORY — proving that a hotter future
    fixture would be CAUGHT rather than silently oracle-mismatched. Build a
    minimal orders/lineitem pair with one item bought by cap+6 users, run
    the REAL harness guard (tools/check_oracles._assert_cap_properties) on
    it, and require the SystemExit."""
    import importlib.util
    import os

    import duckdb
    import pandas as pd
    import pytest as _pytest

    from recsys_spark_spark.cf.itemcf import MAX_ITEM_AUDIENCE

    spec = importlib.util.spec_from_file_location(
        "check_oracles_mod",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "check_oracles.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n_users = MAX_ITEM_AUDIENCE + 6
    orders = pd.DataFrame(
        {"o_orderkey": range(1, n_users + 1), "o_custkey": range(1, n_users + 1)}
    )
    lineitem = pd.DataFrame(
        {"l_orderkey": range(1, n_users + 1), "l_partkey": [42] * n_users}
    )
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    lineitem.to_parquet(tmp_path / "lineitem.parquet", index=False)

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'")
    with _pytest.raises(SystemExit, match="cap property violated"):
        mod._assert_cap_properties(con, str(tmp_path))

    # and the guard stays SILENT on data under both caps (audience cap-1):
    ok_line = pd.DataFrame(
        {"l_orderkey": range(1, MAX_ITEM_AUDIENCE), "l_partkey": [42] * (MAX_ITEM_AUDIENCE - 1)}
    )
    ok_line.to_parquet(tmp_path / "lineitem.parquet", index=False)
    con2 = duckdb.connect()
    for t in ("orders", "lineitem"):
        con2.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'")
    mod._assert_cap_properties(con2, str(tmp_path))
