"""CF math checked against a hand-computed example (SURVEY.md §6.3).

Users:  u1 -> {A, B}, u2 -> {A, B}, u3 -> {A, C}   (all cnt=1)
Norms:  N(A)=3, N(B)=2, N(C)=1
Cooc:   (A,B)=2, (A,C)=1
Cosine: sim(A,B) = 2/sqrt(6) = 0.816497, sim(A,C) = 1/sqrt(3) = 0.577350
Recs:   u3 (seen A,C): only unseen candidate is B via A -> score 0.816497
        u1, u2 (seen A,B): only unseen candidate is C via A -> score 0.577350
"""

from __future__ import annotations

import pytest

from recsys_spark_spark.cf import itemcf

A, B, C = 1, 2, 3


@pytest.fixture(scope="module")
def ui(spark):
    rows = [(1, A, 1, 1.0), (1, B, 1, 1.0), (2, A, 1, 1.0), (2, B, 1, 1.0), (3, A, 1, 1.0), (3, C, 1, 1.0)]
    return spark.createDataFrame(rows, "user_id long, item_id long, cnt long, total_qty double")


def test_norms(ui):
    got = {r.item_id: r.n_users for r in itemcf.item_norms(ui).collect()}
    assert got == {A: 3, B: 2, C: 1}


def test_cooccurrence(ui):
    got = {(r.item_i, r.item_j): r.n_common for r in itemcf.cooccurrence(ui).collect()}
    assert got == {(A, B): 2, (A, C): 1}


def test_cosine(ui):
    sim = itemcf.cosine_similarity(itemcf.cooccurrence(ui), itemcf.item_norms(ui))
    got = {(r.item_i, r.item_j): r.sim for r in sim.collect()}
    assert got == {(A, B): 0.816497, (A, C): 0.57735}


def test_recommend(ui):
    sim = itemcf.cosine_similarity(itemcf.cooccurrence(ui), itemcf.item_norms(ui))
    neighbors = itemcf.topk_neighbors(itemcf.symmetrize(sim)).select("item_i", "item_j", "sim")
    recs = itemcf.recommend(ui, neighbors)
    got = {(r.user_id, r.item_id): (r.score, r.rnk) for r in recs.collect()}
    assert got == {
        (1, C): (0.57735, 1),
        (2, C): (0.57735, 1),
        (3, B): (0.816497, 1),
    }


def test_history_cap_inactive_at_test_sfs(spark):
    """q_cf_recommend runs on capped_interactions (MAX_USER_HISTORY) while its
    oracle uses the uncapped ui CTE; parity is exact only while no user
    exceeds the cap. Guard the invariant at the oracle-checked SFs so a
    testdata regrow can't silently break the oracle (ADVICE r01)."""
    from pyspark.sql import functions as F

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        max_hist = (
            itemcf.interactions(spark, sf)
            .groupBy("user_id")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        assert max_hist < itemcf.MAX_USER_HISTORY, (sf, max_hist)


def test_als_fixed_seed_is_reproducible(spark):
    """I10 has no oracle (iterative/approximate); its correctness surface is
    reproducibility — same seed, same data, same session must produce the
    identical recommendation set twice, or the rows-only driver check is
    meaningless run to run."""
    from recsys_spark_spark.cf.als import q_als_recommend

    sf = "/root/testdata/sf0.001"
    a = {tuple(r) for r in q_als_recommend(spark, sf).collect()}
    b = {tuple(r) for r in q_als_recommend(spark, sf).collect()}
    assert a == b and len(a) > 0


def test_lsh_queries_are_reproducible(spark):
    """The MinHash-LSH and random-hyperplane-LSH queries are rows-only
    (seeded MLlib hashing); their correctness surface is reproducibility —
    identical output for identical input within a session."""
    from recsys_spark_spark.registry import load_all

    queries, _ = load_all()
    sf = "/root/testdata/sf0.001"
    for name in ("q_dedup_minhash_lsh", "q_sim_lsh_ann"):
        a = {tuple(r) for r in queries[name](spark, sf).collect()}
        b = {tuple(r) for r in queries[name](spark, sf).collect()}
        assert a == b and len(a) > 0, name
