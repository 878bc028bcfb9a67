"""Invariants for the stub-backed multimodal transforms (rows-only for the
driver): the Spark-side plumbing contracts that must hold regardless of
which real codec later replaces the deterministic stubs."""

from __future__ import annotations

from recsys_spark_spark.llm.multimodal import RESIZE_TARGET
from recsys_spark_spark.registry import load_all
from tests.conftest import SF_SMOKE

QUERIES, _ = load_all()


def test_resize_preserves_contracts(spark):
    rows = QUERIES["q_multimodal_resize"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # long edge hits the target, dims stay positive, payload is real
        assert max(r.out_w, r.out_h) == RESIZE_TARGET, r
        assert r.out_w >= 1 and r.out_h >= 1, r
        assert r.out_bytes == r.out_w * r.out_h == len(r.resized), r


def test_resize_is_deterministic_across_runs(spark):
    a = {r.doc_id: bytes(r.resized) for r in QUERIES["q_multimodal_resize"](spark, SF_SMOKE).collect()}
    b = {r.doc_id: bytes(r.resized) for r in QUERIES["q_multimodal_resize"](spark, SF_SMOKE).collect()}
    assert a == b
