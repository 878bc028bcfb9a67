"""3.J similarity search over the `embeddings` table (array<float>[64]).

Brute-force cosine top-k is the correctness baseline (J4/J5); LSH bucketing is
the 100 TB path (J6): random-hyperplane buckets turn all-pairs O(n²) into
per-bucket candidates.

Numeric discipline: every per-dimension reduction (dot product, norm, centroid)
is a scaled-integer sum, so Spark's higher-order-function fold, Spark's
explode+agg, and DuckDB's SUM all produce the same 64-bit integer — float32
inputs are cast to double per-element first (emit double, never float32,
SURVEY.md §7.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recsys_spark_spark.catalog import table
from recsys_spark_spark.functions.determinism import dround, rlong
from recsys_spark_spark.registry import query

DIM = 64
PROBE_VEC_ID = 0
TOP_K = 10


def _scaled_dot(a: Column, b: Column) -> Column:
    """Σ round(a_i·b_i·1e12) as exact long — order-independent dot product."""
    prods = F.zip_with(
        a, b, lambda x, y: rlong(x.cast("double") * y.cast("double") * F.lit(1e12))
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)


# Shared CTE chain producing per-vector cosine scores vs the probe — used by
# the q_sim_cosine_knn oracle AND by q_rank_fusion's oracle (llm/retrieval.py).
COSINE_SCORED_CTES = f"""
WITH probe AS (
  SELECT embedding AS pv FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
), pe AS (
  SELECT gs.i, CAST(pv[gs.i] AS DOUBLE) AS px
  FROM probe, generate_series(1, {DIM}) gs(i)
), ve AS (
  SELECT vec_id, gs.i, CAST(embedding[gs.i] AS DOUBLE) AS vx
  FROM embeddings, generate_series(1, {DIM}) gs(i)
), sums AS (
  SELECT vec_id,
         SUM(CAST(ROUND(vx * px * 1e12, 0) AS BIGINT)) AS dot_s,
         SUM(CAST(ROUND(vx * vx * 1e12, 0) AS BIGINT)) AS nv_s
  FROM ve JOIN pe USING (i)
  GROUP BY 1
), pn AS (
  SELECT SUM(CAST(ROUND(px * px * 1e12, 0) AS BIGINT)) AS np_s FROM pe
), scored AS (
  SELECT vec_id,
         ROUND((dot_s / 1e12) / (SQRT(nv_s / 1e12) * SQRT(np_s / 1e12)), 6) AS cosine
  FROM sums, pn
  WHERE vec_id <> {PROBE_VEC_ID}
)"""

_KNN_ORACLE = COSINE_SCORED_CTES + f"""
SELECT vec_id, cosine, rnk FROM (
  SELECT vec_id, cosine,
         CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""


def cosine_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector cosine scores vs the probe (vec_id, cosine) — the Spark
    twin of COSINE_SCORED_CTES, shared by q_sim_cosine_knn and
    q_rank_fusion (llm/retrieval.py)."""
    e = table(spark, sf_dir, "embeddings")
    probe = F.broadcast(
        e.where(F.col("vec_id") == PROBE_VEC_ID).select(F.col("embedding").alias("pv"))
    )
    np_s = _scaled_dot(F.col("pv"), F.col("pv"))
    return (
        e.where(F.col("vec_id") != PROBE_VEC_ID)
        .crossJoin(probe)
        .select(
            "vec_id",
            F.round(
                (_scaled_dot(F.col("embedding"), F.col("pv")) / F.lit(1e12))
                / (
                    F.sqrt(_scaled_dot(F.col("embedding"), F.col("embedding")) / F.lit(1e12))
                    * F.sqrt(np_s / F.lit(1e12))
                ),
                6,
            ).alias("cosine"),
        )
    )


@query("q_sim_cosine_knn", oracle=_KNN_ORACLE)
def q_sim_cosine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: brute-force cosine top-10 vs the probe vector (vec_id=0).

    The probe is a 1-row broadcast; the scan is embarrassingly parallel; only
    the final top-k is a (tiny) global sort — the right brute-force plan at
    any scale. zip_with+aggregate keeps the fold JVM-side (no UDF)."""
    scored = cosine_scored(spark, sf_dir)
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
    )


_CENTROID_KNN_ORACLE = f"""
WITH ve AS (
  SELECT vec_id, label, gs.i, CAST(embedding[gs.i] AS DOUBLE) AS vx
  FROM embeddings, generate_series(1, {DIM}) gs(i)
), cent AS (
  SELECT label, i,
         SUM(CAST(ROUND(vx * 1e9, 0) AS BIGINT)) / (COUNT(*) * 1e9) AS cx
  FROM ve GROUP BY 1, 2
), dists AS (
  SELECT v.vec_id, v.label,
         SUM(CAST(ROUND((v.vx - c.cx) * (v.vx - c.cx) * 1e12, 0) AS BIGINT)) AS d_s
  FROM ve v JOIN cent c ON v.label = c.label AND v.i = c.i
  GROUP BY 1, 2
)
SELECT label, vec_id, dist, rnk FROM (
  SELECT label, vec_id,
         ROUND(SQRT(d_s / 1e12), 6) AS dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY label ORDER BY d_s, vec_id) AS BIGINT) AS rnk
  FROM dists
) WHERE rnk <= 3
"""


@query("q_knn_per_label", oracle=_CENTROID_KNN_ORACLE)
def q_knn_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: per-label centroid (scaled-int mean per dimension) and the 3
    nearest members to each centroid — grouped k-NN in explode form.

    The explode layout (vec_id, dim_index, value) is the scalable dense-vector
    layout for reductions: centroids are one groupBy(label, i), distances one
    join + groupBy(vec_id) — all shuffle-keyed, no driver state."""
    e = table(spark, sf_dir, "embeddings")
    ve = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i0", "vx"),
    ).select("vec_id", "label", (F.col("i0") + 1).alias("i"), "vx")
    cent = ve.groupBy("label", "i").agg(
        (F.sum(rlong(F.col("vx") * F.lit(1e9))) / (F.count(F.lit(1)) * F.lit(1e9))).alias("cx")
    )
    diff = F.col("vx") - F.col("cx")
    dists = (
        ve.join(cent, ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(F.sum(rlong(diff * diff * F.lit(1e12))).alias("d_s"))
    )
    w = Window.partitionBy("label").orderBy("d_s", "vec_id")
    return (
        dists.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("label", "vec_id", F.round(F.sqrt(F.col("d_s") / 1e12), 6).alias("dist"), "rnk")
    )


@query("q_sim_lsh_ann")  # rows-only: random-hyperplane LSH is seed-dependent
def q_sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: approximate NN at scale — BucketedRandomProjectionLSH. Buckets
    bound the candidate set; the join is per-bucket (the 100 TB ANN path)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(e)
    probe = e.where(F.col("vec_id") == PROBE_VEC_ID).first()["features"]
    ann = model.approxNearestNeighbors(e.where(F.col("vec_id") != PROBE_VEC_ID), probe, TOP_K)
    return ann.select("vec_id", F.round(F.col("distCol"), 6).alias("dist"))


NBITS = 4  # sign bits of dims 1..4 -> 16 IVF cells; probe scans cell + 4 Hamming-1 neighbors


def _cell(vec: Column) -> Column:
    """Deterministic IVF cell id: sign bits of the first NBITS dimensions.
    A real IVF trains centroids; sign-bit cells are the deterministic
    (seedless, engine-portable) stand-in with the same plan shape."""
    bits = [
        F.when(F.element_at(vec, b + 1).cast("double") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(NBITS)
    ]
    bit_sum = bits[0]
    for b in bits[1:]:
        bit_sum = bit_sum + b
    return bit_sum


_IVF_CELL_SQL = " + ".join(
    f"(CASE WHEN CAST(embedding[{b + 1}] AS DOUBLE) >= 0 THEN {1 << b} ELSE 0 END)"
    for b in range(NBITS)
)

_IVF_ORACLE = f"""
WITH cells AS (
  SELECT vec_id, embedding, ({_IVF_CELL_SQL}) AS cell FROM embeddings
), pc AS (
  SELECT cell AS pcell, embedding AS pv FROM cells WHERE vec_id = {PROBE_VEC_ID}
), cand AS (
  SELECT c.vec_id, c.embedding, pv FROM cells c, pc
  WHERE bit_count(xor(c.cell, pcell)) <= 1 AND c.vec_id <> {PROBE_VEC_ID}
), pe AS (
  SELECT gs.i, CAST(pv[gs.i] AS DOUBLE) AS px FROM pc, generate_series(1, {DIM}) gs(i)
), ve AS (
  SELECT vec_id, gs.i, CAST(embedding[gs.i] AS DOUBLE) AS vx
  FROM cand, generate_series(1, {DIM}) gs(i)
), sums AS (
  SELECT vec_id,
         SUM(CAST(ROUND(vx * px * 1e12, 0) AS BIGINT)) AS dot_s,
         SUM(CAST(ROUND(vx * vx * 1e12, 0) AS BIGINT)) AS nv_s
  FROM ve JOIN pe USING (i)
  GROUP BY 1
), pn AS (
  SELECT SUM(CAST(ROUND(px * px * 1e12, 0) AS BIGINT)) AS np_s FROM pe
), scored AS (
  SELECT vec_id,
         ROUND((dot_s / 1e12) / (SQRT(nv_s / 1e12) * SQRT(np_s / 1e12)), 6) AS cosine
  FROM sums, pn
)
SELECT vec_id, cosine, rnk FROM (
  SELECT vec_id, cosine,
         CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""


@query("q_sim_ivf_knn", oracle=_IVF_ORACLE)
def q_sim_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6b: IVF-style pruned cosine top-10 — the deterministic, exact-oracle
    scale path beside the seeded LSH variant (q_sim_lsh_ann).

    Vectors are assigned to 2^NBITS cells by the sign bits of their leading
    dimensions; the probe scans only its own cell plus the NBITS Hamming-1
    neighbors (5/16 of the data here) and brute-forces cosine inside. At
    100 TB `cell` is the table's partition column, so the candidate filter
    becomes *partition pruning* — the scan never touches non-probed cells —
    and per-cell fan-out is bounded regardless of corpus size. The answer is
    a deterministic function of the data (no seed, no train step), which is
    what makes an exact DuckDB oracle possible where LSH gets rows-only.
    """
    e = table(spark, sf_dir, "embeddings")
    cells = e.select("vec_id", "embedding", _cell(F.col("embedding")).alias("cell"))
    probe = F.broadcast(
        cells.where(F.col("vec_id") == PROBE_VEC_ID).select(
            F.col("cell").alias("pcell"), F.col("embedding").alias("pv")
        )
    )
    cand = (
        cells.where(F.col("vec_id") != PROBE_VEC_ID)
        .crossJoin(probe)
        .where(F.bit_count(F.expr("cell ^ pcell")) <= 1)
    )
    np_s = _scaled_dot(F.col("pv"), F.col("pv"))
    scored = cand.select(
        "vec_id",
        F.round(
            (_scaled_dot(F.col("embedding"), F.col("pv")) / F.lit(1e12))
            / (
                F.sqrt(_scaled_dot(F.col("embedding"), F.col("embedding")) / F.lit(1e12))
                * F.sqrt(np_s / F.lit(1e12))
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
    )


# --------------------------------------------------------------------------
# M115: one Lloyd iteration of k-means over the embedding table
# --------------------------------------------------------------------------

KMEANS_K = 8


def _scaled_sqdist(a: Column, b: Column) -> Column:
    """Σ round((a_i−b_i)²·1e12) as exact long — order-independent squared L2."""
    terms = F.zip_with(
        a,
        b,
        lambda x, y: rlong(
            (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
            * F.lit(1e12)
        ),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)


@query(
    "q_kmeans_step",
    oracle=f"""
WITH seeds AS (
  SELECT vec_id AS sid, embedding AS sv FROM embeddings ORDER BY vec_id LIMIT {KMEANS_K}
), se AS (
  SELECT sid, gs.i, CAST(sv[gs.i] AS DOUBLE) AS sx
  FROM seeds, generate_series(1, {DIM}) gs(i)
), ve AS (
  SELECT vec_id, gs.i, CAST(embedding[gs.i] AS DOUBLE) AS vx
  FROM embeddings, generate_series(1, {DIM}) gs(i)
), dists AS (
  SELECT v.vec_id, s.sid,
         SUM(CAST(ROUND((vx - sx) * (vx - sx) * 1e12, 0) AS BIGINT)) AS dist_s
  FROM ve v JOIN se s ON v.i = s.i
  GROUP BY 1, 2
), assign AS (
  SELECT vec_id, sid AS cluster_id FROM (
    SELECT vec_id, sid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist_s, sid) AS rn
    FROM dists
  ) WHERE rn = 1
), members AS (
  SELECT a.cluster_id, gs.i,
         CAST(e.embedding[gs.i] AS DOUBLE) AS vx
  FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id,
       generate_series(1, {DIM}) gs(i)
)
SELECT cluster_id, i AS dim_i,
       (ROUND(SUM(CAST(ROUND(vx * 1e9, 0) AS BIGINT)) / (1e9 * COUNT(*)) * 1e6,
              0) / 1e6) AS centroid,
       COUNT(*) AS n_members
FROM members GROUP BY 1, 2
""",
)
def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M115: one exact Lloyd iteration of k-means over the embedding
    column — nearest-seed assignment (squared L2) plus the recomputed
    per-dimension centroids, in long format (cluster_id, dim_i, centroid,
    n_members). The building block of distributed k-means / IVF training
    (the coarse quantizer q_sim_ivf_knn presupposes); iterating this step
    to convergence IS k-means, each iteration one broadcast + two keyed
    aggregations.

    Determinism end-to-end: seeds are the first {KMEANS_K} vec_ids (no
    RNG); distances are exact integer sums of nano-rounded squared diffs
    (the _scaled_dot discipline — JVM-side zip_with/aggregate, no Python
    in the loop); the argmin tie-breaks on (dist, seed id); centroid
    means are nano-rounded integer sums divided once. Scale shape: the
    K-row seed table is broadcast (model-to-data, like the CF neighbor
    model); assignment is row-local; the centroid update is ONE
    (cluster, dim)-keyed aggregate with map-side partials — K·DIM output
    rows. No all-pairs anything."""
    e = table(spark, sf_dir, "embeddings")
    seeds = F.broadcast(
        e.orderBy("vec_id")
        .limit(KMEANS_K)
        .select(F.col("vec_id").alias("sid"), F.col("embedding").alias("sv"))
    )
    dists = e.crossJoin(seeds).select(
        "vec_id",
        "sid",
        _scaled_sqdist(F.col("embedding"), F.col("sv")).alias("dist_s"),
    )
    w = Window.partitionBy("vec_id").orderBy("dist_s", "sid")
    assign = (
        dists.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("sid").alias("cluster_id"))
    )
    members = assign.join(e, "vec_id").select(
        "cluster_id", F.posexplode("embedding").alias("pos", "val")
    )
    return (
        members.groupBy("cluster_id", (F.col("pos") + 1).alias("dim_i"))
        .agg(
            F.sum(rlong(F.col("val").cast("double") * F.lit(1e9))).alias("s9"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "cluster_id",
            F.col("dim_i").cast("long").alias("dim_i"),
            dround(F.col("s9") / (F.lit(1e9) * F.col("n_members")), 6).alias("centroid"),
            "n_members",
        )
    )


# --------------------------------------------------------------------------
# M116: product-quantization encoding (PQ codes for compressed ANN)
# --------------------------------------------------------------------------

PQ_SUBSPACES = 8           # 64 dims -> 8 subspaces of 8 dims
PQ_SUBDIM = DIM // PQ_SUBSPACES
PQ_CODEBOOK = 4            # codewords per subspace (first-K seed subvectors)


@query(
    "q_embed_pq_encode",
    oracle=f"""
WITH seeds AS (
  SELECT vec_id AS sid, embedding AS sv FROM embeddings ORDER BY vec_id LIMIT {PQ_CODEBOOK}
), se AS (
  SELECT sid, s.s, gi.i,
         CAST(sv[s.s * {PQ_SUBDIM} + gi.i] AS DOUBLE) AS sx
  FROM seeds,
       generate_series(0, {PQ_SUBSPACES - 1}) s(s),
       generate_series(1, {PQ_SUBDIM}) gi(i)
), ve AS (
  SELECT vec_id, s.s, gi.i,
         CAST(embedding[s.s * {PQ_SUBDIM} + gi.i] AS DOUBLE) AS vx
  FROM embeddings,
       generate_series(0, {PQ_SUBSPACES - 1}) s(s),
       generate_series(1, {PQ_SUBDIM}) gi(i)
), dists AS (
  SELECT v.vec_id, v.s, e.sid,
         SUM(CAST(ROUND((vx - sx) * (vx - sx) * 1e12, 0) AS BIGINT)) AS dist_s
  FROM ve v JOIN se e ON v.s = e.s AND v.i = e.i
  GROUP BY 1, 2, 3
)
SELECT vec_id, s AS subspace, sid AS code,
       (ROUND(dist_s / 1e12 * 1e6, 0) / 1e6) AS sq_err
FROM (
  SELECT vec_id, s, sid, dist_s,
         ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist_s, sid) AS rn
  FROM dists
) WHERE rn = 1
""",
)
def q_embed_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M116: product-quantization encoding (Jégou et al., 'Product
    quantization for nearest neighbor search', TPAMI 2011) — each vector
    compressed to {PQ_SUBSPACES} codebook ids by quantizing each
    {PQ_SUBDIM}-dim subvector to its nearest codeword, with the per-block
    quantization error. PQ is how billion-scale ANN indexes store
    vectors (64 floats -> {PQ_SUBSPACES} bytes here); the codebook is the
    first-{PQ_CODEBOOK} seed subvectors (train it by iterating
    q_kmeans_step per subspace).

    Plan: the codebook (K·S subvector rows) is BROADCAST; vectors fan out
    row-locally into S subvector slices (slice() on the array — no
    explode of raw dims crosses the wire); distance is the exact
    integer-sum fold (zip_with/aggregate, JVM-side); the per-(vector,
    subspace) argmin is a WindowGroupLimit-prunable rank-1 window keyed
    by the same fan-out — one narrow exchange on (vec_id, subspace)."""
    e = table(spark, sf_dir, "embeddings")
    sub = F.explode(F.sequence(F.lit(0), F.lit(PQ_SUBSPACES - 1))).alias("s")
    vecs = e.select("vec_id", sub, "embedding").select(
        "vec_id",
        "s",
        F.expr(f"slice(embedding, s * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("subv"),
    )
    seeds = F.broadcast(
        e.orderBy("vec_id")
        .limit(PQ_CODEBOOK)
        .select(F.col("vec_id").alias("sid"), sub, "embedding")
        .select(
            "sid",
            F.col("s").alias("cs"),
            F.expr(f"slice(embedding, s * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("codev"),
        )
    )
    dists = vecs.join(seeds, vecs.s == seeds.cs).select(
        "vec_id",
        "s",
        "sid",
        _scaled_sqdist(F.col("subv"), F.col("codev")).alias("dist_s"),
    )
    w = Window.partitionBy("vec_id", "s").orderBy("dist_s", "sid")
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("s").cast("long").alias("subspace"),
            F.col("sid").alias("code"),
            dround(F.col("dist_s") / F.lit(1e12), 6).alias("sq_err"),
        )
    )


# --------------------------------------------------------------------------
# M154: embedding-quality audit
# --------------------------------------------------------------------------


@query(
    "q_embed_norm_audit",
    oracle=f"""
WITH ve AS (
  SELECT vec_id, label, gs.i, CAST(embedding[gs.i] AS DOUBLE) AS vx
  FROM embeddings, generate_series(1, {DIM}) gs(i)
),
per AS (
  SELECT vec_id, label,
         COUNT(*) AS dim,
         SUM(CAST(ROUND(vx * vx * 1e12, 0) AS BIGINT)) AS n2_s,
         SUM(CASE WHEN vx = 0 THEN 1 ELSE 0 END) AS n_zero_elems
  FROM ve GROUP BY 1, 2
),
b AS (
  SELECT label, dim,
         CAST(FLOOR(SQRT(n2_s / 1e12) * 10) AS BIGINT) AS norm_decile_bucket,
         CASE WHEN n2_s = 0 THEN 1 ELSE 0 END AS is_zero,
         SQRT(n2_s / 1e12) AS norm,
         n_zero_elems
  FROM per
)
SELECT label, CAST(dim AS BIGINT) AS dim, norm_decile_bucket,
       COUNT(*) AS n_vecs,
       CAST(SUM(is_zero) AS BIGINT) AS n_zero_vecs,
       CAST(SUM(n_zero_elems) AS BIGINT) AS n_zero_elems,
       ROUND(MIN(norm) * 1e6, 0) / 1e6 AS min_norm,
       ROUND(MAX(norm) * 1e6, 0) / 1e6 AS max_norm
FROM b GROUP BY 1, 2, 3
""",
)
def q_embed_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M154: embedding-table quality audit — per (label, dim, norm-decile)
    bucket: vector counts, all-zero vectors (dead encoder outputs), zero
    elements (dead dimensions), and the min/max L2 norm. The ingest gate
    a vector pipeline runs before building an index: zero vectors poison
    cosine similarity (undefined norm) and wildly varying norms flag
    unnormalized batches.

    Shape: norms are row-local JVM-side folds (F.aggregate over the
    array — no Python UDF, no explode shuffle on the Spark side), then
    ONE keyed aggregate to bucket-count-sized output. Exactness: per-
    element squares are pico-rounded to integers BEFORE the fold (the
    q_sim_cosine_knn discipline), so every norm² is an exact integer and
    both engines bucket and round the same doubles."""
    e = table(spark, sf_dir, "embeddings")
    n2 = F.aggregate(
        F.col("embedding"),
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + rlong(x.cast("double") * x.cast("double") * F.lit(1e12)).cast("long"),
    )
    nz = F.aggregate(
        F.col("embedding"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.when(x == 0, 1).otherwise(0).cast("long"),
    )
    per = e.select(
        "label",
        F.size("embedding").cast("long").alias("dim"),
        n2.alias("n2_s"),
        nz.alias("n_zero_elems"),
    )
    norm = F.sqrt(F.col("n2_s") / 1e12)
    b = per.select(
        "label",
        "dim",
        F.floor(norm * 10).cast("long").alias("norm_decile_bucket"),
        F.when(F.col("n2_s") == 0, 1).otherwise(0).alias("is_zero"),
        norm.alias("norm"),
        "n_zero_elems",
    )
    return b.groupBy("label", "dim", "norm_decile_bucket").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("is_zero").cast("long").alias("n_zero_vecs"),
        F.sum("n_zero_elems").cast("long").alias("n_zero_elems"),
        (rlong(F.min("norm") * 1e6) / 1e6).alias("min_norm"),
        (rlong(F.max("norm") * 1e6) / 1e6).alias("max_norm"),
    )


# --------------------------------------------------------------------------
# M205: PQ asymmetric-distance top-k search (the ADC scan of IVFADC)
# --------------------------------------------------------------------------

PQ_NQ = 5        # query set: first PQ_NQ vec_ids
PQ_ADC_TOPK = 10



_PQ_ADC_ORACLE = f"""
WITH seeds AS (
  SELECT vec_id AS sid, embedding AS sv FROM embeddings ORDER BY vec_id LIMIT {PQ_CODEBOOK}
), se AS (
  SELECT sid, s.s, gi.i,
         CAST(sv[s.s * {PQ_SUBDIM} + gi.i] AS DOUBLE) AS sx
  FROM seeds,
       generate_series(0, {PQ_SUBSPACES - 1}) s(s),
       generate_series(1, {PQ_SUBDIM}) gi(i)
), ve AS (
  SELECT vec_id, s.s, gi.i,
         CAST(embedding[s.s * {PQ_SUBDIM} + gi.i] AS DOUBLE) AS vx
  FROM embeddings,
       generate_series(0, {PQ_SUBSPACES - 1}) s(s),
       generate_series(1, {PQ_SUBDIM}) gi(i)
), cd AS (
  SELECT v.vec_id, v.s, e.sid,
         SUM(CAST(ROUND((vx - sx) * (vx - sx) * 1e12, 0) AS BIGINT)) AS dist_s
  FROM ve v JOIN se e ON v.s = e.s AND v.i = e.i
  GROUP BY 1, 2, 3
), codes AS MATERIALIZED (
  SELECT vec_id, s, sid AS code FROM (
    SELECT vec_id, s, sid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist_s, sid) AS rn
    FROM cd
  ) WHERE rn = 1
), qids AS (
  SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT {PQ_NQ}
), dtab AS MATERIALIZED (
  SELECT v.vec_id AS qid, v.s, e.sid,
         SUM(CAST(ROUND((vx - sx) * (vx - sx) * 1e12, 0) AS BIGINT)) AS qd_s
  FROM ve v JOIN qids q ON q.qid = v.vec_id
  JOIN se e ON v.s = e.s AND v.i = e.i
  GROUP BY 1, 2, 3
), adc AS (
  SELECT d.qid, c.vec_id, SUM(d.qd_s) AS total_s
  FROM codes c JOIN dtab d ON d.s = c.s AND d.sid = c.code
  WHERE c.vec_id <> d.qid
  GROUP BY 1, 2
)
SELECT qid AS query_id, vec_id AS neighbor_id,
       ROUND(total_s / 1e12 * 1e6, 0) / 1e6 AS adc_dist, rnk
FROM (
  SELECT qid, vec_id, total_s,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY total_s, vec_id) AS BIGINT) AS rnk
  FROM adc
) WHERE rnk <= {PQ_ADC_TOPK}
"""


def pq_codes(e: DataFrame) -> DataFrame:
    """(vec_id, s, code): each vector's nearest-codeword assignment per
    subspace — the same argmin as q_embed_pq_encode, split out so the ADC
    search below and tests reuse it."""
    sub = F.explode(F.sequence(F.lit(0), F.lit(PQ_SUBSPACES - 1))).alias("s")
    vecs = e.select("vec_id", sub, "embedding").select(
        "vec_id",
        "s",
        F.expr(f"slice(embedding, s * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("subv"),
    )
    seeds = F.broadcast(
        e.orderBy("vec_id")
        .limit(PQ_CODEBOOK)
        .select(F.col("vec_id").alias("sid"), sub, "embedding")
        .select(
            "sid",
            F.col("s").alias("cs"),
            F.expr(f"slice(embedding, s * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("codev"),
        )
    )
    dists = vecs.join(seeds, vecs.s == seeds.cs).select(
        "vec_id", "s", "sid", _scaled_sqdist(F.col("subv"), F.col("codev")).alias("dist_s")
    )
    w = Window.partitionBy("vec_id", "s").orderBy("dist_s", "sid")
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "s", F.col("sid").alias("code"))
    )


@query("q_sim_pq_adc", oracle=_PQ_ADC_ORACLE)
def q_sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M205: PQ asymmetric distance computation (ADC) top-{PQ_ADC_TOPK}
    search (Jégou et al., TPAMI 2011 §IV) — the scan stage of IVFADC, the
    query-time complement to q_embed_pq_encode's index build: approximate
    d(q, x) = Σ_s dtab[q][s][code_s(x)], where dtab holds the EXACT
    distances from each query subvector to every codeword.

    Why this is the billion-scale plan: at query time the raw vectors are
    never touched — the scan reads only the code table ({PQ_SUBSPACES}
    small ints per vector) and joins it against a broadcast distance
    table of PQ_NQ x {PQ_SUBSPACES} x {PQ_CODEBOOK} precomputed entries
    (model-to-data, the CF-neighbor pattern); the per-candidate score is
    a (query, vector)-keyed integer SUM with map-side partials, and the
    final top-k is a WindowGroupLimit-pruned rank over query partitions.
    Compare q_sim_cosine_knn (exact brute force, reads every float) and
    q_sim_ivf_knn (cell-pruned exact): ADC trades recall for a ~32x
    smaller scan (64 floats -> 8 codes here).

    Exactness: codes and dtab reuse the nano-scaled integer squared-
    distance fold (_scaled_sqdist), sums of longs, ties broken on ids —
    deterministic on both engines; self-matches are excluded."""
    e = table(spark, sf_dir, "embeddings")
    codes = pq_codes(e)
    sub = F.explode(F.sequence(F.lit(0), F.lit(PQ_SUBSPACES - 1))).alias("s")
    seeds = (
        e.orderBy("vec_id")
        .limit(PQ_CODEBOOK)
        .select(F.col("vec_id").alias("sid"), sub, "embedding")
        .select(
            "sid",
            F.col("s").alias("qs"),
            F.expr(f"slice(embedding, s * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("codev"),
        )
    )
    qsub = (
        e.orderBy("vec_id")
        .limit(PQ_NQ)
        .select(F.col("vec_id").alias("qid"), sub, "embedding")
        .select(
            "qid",
            "s",
            F.expr(f"slice(embedding, s * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("qv"),
        )
    )
    dtab = qsub.join(seeds, qsub.s == seeds.qs).select(
        "qid", "s", "sid", _scaled_sqdist(F.col("qv"), F.col("codev")).alias("qd_s")
    )
    adc = (
        codes.join(
            F.broadcast(dtab),
            (codes.s == dtab.s) & (codes.code == dtab.sid),
        )
        .where(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("qd_s").alias("total_s"))
    )
    w = Window.partitionBy("qid").orderBy("total_s", "vec_id")
    return (
        adc.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= PQ_ADC_TOPK)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            dround(F.col("total_s") / F.lit(1e12), 6).alias("adc_dist"),
            "rnk",
        )
    )
