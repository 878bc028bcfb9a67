"""3.M hybrid retrieval — reciprocal-rank fusion of the lexical (BM25) and
semantic (embedding-cosine) rankers.

RAG-style corpora are queried both ways; the standard way to combine the two
orderings without score calibration is RRF (Cormack et al., SIGIR 2009):
score(d) = Σ_lists 1/(k + rank_list(d)). Ranks are exact integers from the
deterministic scorers (llm/text.bm25_scored, llm/similarity.cosine_scored), so
the fused score is the same IEEE double on both engines — fixed operand order,
no accumulation across variable row counts.

Join key: documents.doc_id and embeddings.vec_id share one id space, but
coverage is PARTIAL at some SFs (FIXTURES.md: sf0.1 has 5,000 docs and only
2,000 embeddings), so a doc without an embedding can never appear in the
semantic list — its fused score is structurally lexical-only. The FULL OUTER
fusion join is what makes that sound: it keeps one-list docs with the other
rank NULL on both engines, never dropping or fabricating evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recsys_spark_spark.llm.similarity import COSINE_SCORED_CTES, cosine_scored
from recsys_spark_spark.llm.text import BM25_SCORED_CTES, bm25_scored
from recsys_spark_spark.registry import query

RRF_K = 60  # the canonical damping constant from the RRF paper
FUSE_N = 50  # depth of each input ranking
FUSE_TOP = 20  # fused results returned

# DuckDB cannot chain two WITH clauses, so the cosine CTE chain is spliced
# into the BM25 chain by dropping its leading "\nWITH" (the fragments use
# disjoint CTE names by construction: tok/dl/stats/tf/df/scored vs
# probe/pe/ve/sums/pn/scored2 after the rename below).
_COSINE_CTES_SPLICE = COSINE_SCORED_CTES.replace("\nWITH ", ",\n", 1).replace(
    "), scored AS (", "), scored2 AS ("
)
# Guard the string surgery: if either fragment's formatting or CTE naming
# drifts, the replaces silently no-op and the fusion oracle becomes invalid
# SQL (or worse, valid-but-wrong). Fail at import instead.
assert COSINE_SCORED_CTES.startswith("\nWITH "), "cosine CTE shape drifted"
assert _COSINE_CTES_SPLICE.startswith(",\n"), "cosine 'WITH' splice no-opped"
assert "scored2" in _COSINE_CTES_SPLICE, "cosine CTE 'scored' rename no-opped"
assert "scored" in BM25_SCORED_CTES and "scored2" not in BM25_SCORED_CTES

_FUSION_ORACLE = (
    BM25_SCORED_CTES
    + _COSINE_CTES_SPLICE
    + f"""
, lex AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY raw DESC, doc_id) AS lex_rank
  FROM scored QUALIFY lex_rank <= {FUSE_N}
), sem AS (
  SELECT vec_id AS doc_id,
         ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS sem_rank
  FROM scored2 QUALIFY sem_rank <= {FUSE_N}
), fused AS (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         CAST(lex.lex_rank AS BIGINT) AS lex_rank,
         CAST(sem.sem_rank AS BIGINT) AS sem_rank,
         COALESCE(1e0 / ({RRF_K} + lex.lex_rank), 0e0)
           + COALESCE(1e0 / ({RRF_K} + sem.sem_rank), 0e0) AS rrf
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id, lex_rank, sem_rank, rrf,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rnk
FROM fused
QUALIFY rnk <= {FUSE_TOP}
"""
)


@query("q_rank_fusion", oracle=_FUSION_ORACLE)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M77: hybrid retrieval via reciprocal-rank fusion — top-50 lexical
    (BM25) and top-50 semantic (cosine vs the probe vector) rankings fused
    with score(d) = Σ 1/(60 + rank), top-20 returned with both input ranks
    (NULL where a doc appears in only one list).

    Scale shape: each input ranking is a global top-N of an
    already-aggregated score table (TakeOrderedAndProject /
    WindowGroupLimit — never a full sort of the corpus); the fusion join
    touches at most 2N rows, driver-free and broadcast-sized regardless of
    corpus size. This is the retrieval-layer pattern at any scale: rankers
    prune FIRST, fusion runs on the pruned heads."""
    lex_w = Window.orderBy(F.col("raw").desc(), "doc_id")
    lex = (
        bm25_scored(spark, sf_dir)
        .withColumn("lex_rank", F.row_number().over(lex_w).cast("long"))
        .where(F.col("lex_rank") <= FUSE_N)
        .select("doc_id", "lex_rank")
    )
    sem_w = Window.orderBy(F.col("cosine").desc(), "vec_id")
    sem = (
        cosine_scored(spark, sf_dir)
        .withColumn("sem_rank", F.row_number().over(sem_w).cast("long"))
        .where(F.col("sem_rank") <= FUSE_N)
        .select(F.col("vec_id").alias("doc_id"), "sem_rank")
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            (
                F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("sem_rank")), F.lit(0.0))
            ).alias("rrf"),
        )
    )
    rnk_w = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(rnk_w).cast("long"))
        .where(F.col("rnk") <= FUSE_TOP)
    )
