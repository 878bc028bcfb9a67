"""catalog.memo_persist: the shared persisted-DataFrame memo lifecycle.

Round-5 ADVICE flagged that the module-level memo dicts (_CAPPED, _PR_EDGES,
_EIG_EDGES, _MINUTE_TIER, _MH_SIGS, _FIRST_SEEN) pinned storage forever in a
long-lived session touching many sf_dirs. memo_persist centralizes the
pattern with an LRU cap; these tests pin its contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from recsys_spark_spark.catalog import MEMO_CAP, memo_persist


def _mk(spark, n):
    return spark.range(n).select(F.col("id").alias("v"))


def test_memo_hit_returns_same_handle_and_stays_persisted(spark):
    memo = {}
    a = memo_persist(memo, ("app", "k1"), lambda: _mk(spark, 3))
    b = memo_persist(memo, ("app", "k1"), lambda: _mk(spark, 99))
    assert a is b  # build not re-invoked on hit
    lvl = b.storageLevel
    assert lvl.useMemory or lvl.useDisk
    for df in memo.values():
        df.unpersist(blocking=False)


def test_memo_evicts_oldest_beyond_cap_and_unpersists(spark):
    memo = {}
    dfs = [
        memo_persist(memo, ("app", f"k{i}"), lambda i=i: _mk(spark, i + 1))
        for i in range(MEMO_CAP + 2)
    ]
    assert len(memo) == MEMO_CAP
    # the two oldest were evicted and unpinned; the rest stay persisted
    for df in dfs[:2]:
        lvl = df.storageLevel
        assert not (lvl.useMemory or lvl.useDisk)
    for df in dfs[2:]:
        lvl = df.storageLevel
        assert lvl.useMemory or lvl.useDisk
    # evicted handles still compute correctly, just uncached
    assert dfs[0].count() == 1
    for df in memo.values():
        df.unpersist(blocking=False)


def test_memo_hit_refreshes_lru_position(spark):
    memo = {}
    first = memo_persist(memo, ("app", "old"), lambda: _mk(spark, 1))
    for i in range(MEMO_CAP - 1):
        memo_persist(memo, ("app", f"f{i}"), lambda i=i: _mk(spark, i + 2))
    # touch "old" so it is most-recent, then insert one more: the evictee
    # must be f0, not the just-touched "old"
    memo_persist(memo, ("app", "old"), lambda: _mk(spark, 1))
    memo_persist(memo, ("app", "new"), lambda: _mk(spark, 50))
    assert ("app", "old") in memo and ("app", "f0") not in memo
    lvl = first.storageLevel
    assert lvl.useMemory or lvl.useDisk
    for df in memo.values():
        df.unpersist(blocking=False)
