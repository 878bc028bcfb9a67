"""3.M LLM training-data layout — chunking, sequence packing, quantization.

The last mile of a training-data pipeline after dedup/quality filtering
(llm/dedup.py, llm/text.py): cut documents into model-window-sized pieces,
pack the pieces into fixed-token-budget training sequences, and shrink
embedding payloads with int8 quantization. All three are pure column
expressions or per-key windows — no UDFs, no driver state, no global sort —
so the plans hold unchanged from local[32] to a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recsys_spark_spark.catalog import table
from recsys_spark_spark.functions.determinism import rlong
from recsys_spark_spark.registry import query

CHUNK_CHARS = 120     # chunk width (model context window stand-in)
CHUNK_STRIDE = 100    # stride < width → 20-char overlap between chunks
PACK_BUDGET = 512     # token budget per packed training sequence
PACK_BUCKETS = 8      # parallel packing streams (independent bins)


@query(
    "q_chunk_fixed",
    oracle=f"""
SELECT doc_id,
       CAST(gs.start // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(gs.start AS BIGINT) AS start,
       CAST(len(substring(text, CAST(gs.start AS INTEGER) + 1, {CHUNK_CHARS})) AS BIGINT) AS chunk_len,
       md5(substring(text, CAST(gs.start AS INTEGER) + 1, {CHUNK_CHARS})) AS chunk_md5
FROM documents, unnest(generate_series(0, n_chars - 1, {CHUNK_STRIDE})) AS gs(start)
""",
)
def q_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window document chunking with overlap: every document becomes
    ⌈n_chars / stride⌉ chunks of up to CHUNK_CHARS characters, consecutive
    chunks overlapping by (width − stride) so no span is lost at a boundary —
    the standard layout step before tokenize-and-train.

    `sequence(0, n_chars−1, stride)` + posexplode is a row-local fan-out: no
    shuffle at all, output size is a fixed multiple of input size, and the
    substring/md5 run inside whole-stage codegen. Chunk text is emitted as
    md5 so the oracle compares content without hauling full text through the
    compare; both engines' substring/len are character-based (UTF-8 safe for
    the zh documents)."""
    d = table(spark, sf_dir, "documents")
    # sequence(0, -1, +step) THROWS on Spark for an empty document while
    # DuckDB's generate_series returns an empty set — guard to an empty list
    # so a zero-length doc yields no chunks on both sides (same guard shape
    # as the bigram extraction in llm/dedup.py)
    starts = F.when(
        F.col("n_chars") > 0,
        F.expr(f"sequence(0, cast(n_chars - 1 as int), {CHUNK_STRIDE})"),
    ).otherwise(F.expr("array()").cast("array<int>"))
    ex = d.select("doc_id", "text", F.posexplode(starts).alias("chunk_idx", "start"))
    chunk = F.col("text").substr(F.col("start") + 1, F.lit(CHUNK_CHARS))
    return ex.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start"),
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


_BUCKET_SQL = f"CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {PACK_BUCKETS}"


@query(
    "q_pack_sequences",
    oracle=f"""
WITH sized AS (
  SELECT doc_id,
         {_BUCKET_SQL} AS bucket,
         CAST(CEIL(n_chars / 4.0) AS BIGINT) AS n_tok
  FROM documents
),
packed AS (
  SELECT doc_id, bucket, n_tok,
         CAST(SUM(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tok AS start_tok
  FROM sized
)
SELECT doc_id, bucket, n_tok, start_tok,
       CAST(FLOOR(start_tok / {PACK_BUDGET}.0) AS BIGINT) AS seq_id
FROM packed
""",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents into a token stream and cut it
    into PACK_BUDGET-token training sequences — each document gets its stream
    offset and the id of the sequence its first token lands in (the
    concat-then-split packing used to avoid padding waste in LLM training).

    Packing is inherently sequential, which is the scale hazard: a single
    global cumulative sum would funnel 100 TB through one partition. Instead
    documents are split into PACK_BUCKETS independent streams by content hash
    (md5 — deterministic, engine-portable, growth-stable like
    llm/sampling.py), and the running sum is windowed per bucket: at scale
    each stream packs in parallel and the only shuffle is the hash partition
    by bucket. Token counts use the ceil(chars/4) estimate from
    q_text_token_count; swapping in real tokenizer counts changes one
    expression."""
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % PACK_BUCKETS
    )
    sized = d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.ceil(F.col("n_chars") / 4.0).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sized.withColumn(
        "start_tok", (F.sum("n_tok").over(w) - F.col("n_tok")).cast("long")
    )
    return packed.select(
        "doc_id",
        "bucket",
        "n_tok",
        "start_tok",
        F.floor(F.col("start_tok") / float(PACK_BUDGET)).cast("long").alias("seq_id"),
    )


@query(
    "q_embed_quantize",
    oracle="""
WITH base AS (
  SELECT vec_id, label, embedding,
         GREATEST(list_max(list_transform(embedding, x -> ABS(CAST(x AS DOUBLE)))), 1e-12) / 127.0 AS q_scale
  FROM embeddings
)
SELECT vec_id, label,
       (ROUND(q_scale * 1e9, 0) / 1e9) AS q_scale_r,
       (list_sum(list_transform(embedding, x ->
           CAST(ROUND(ABS(CAST(x AS DOUBLE) - ROUND(CAST(x AS DOUBLE) / q_scale, 0) * q_scale) * 1e6, 0) AS BIGINT)
        )) / (len(embedding) * 1e6)) AS mean_abs_err
FROM base
""",
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization with reconstruction-error audit:
    per vector, scale = max|x|/127, quantized dim q = round(x/scale), and the
    mean absolute dequantization error |x − q·scale| — the 4× payload shrink
    (float32 → int8) applied before shipping embeddings to an ANN index, plus
    the quality metric that decides whether the shrink is acceptable.

    Entirely row-local array expressions (transform / array_max / aggregate)
    inside whole-stage codegen — zero shuffles at any scale. The error sum
    uses the scaled-integer discipline (functions/determinism.py): each
    per-dim error rounds to a long at 1e-6 before summing, so the fold is
    exact and order-independent and the DuckDB oracle matches bit-for-bit;
    round() ties between engines (half-even vs half-away) are measure-zero
    on real-valued inputs (see rlong docstring)."""
    e = table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    absmax = F.array_max(F.transform("embedding", lambda x: F.abs(xd(x))))
    base = e.select(
        "vec_id",
        "label",
        "embedding",
        (F.greatest(absmax, F.lit(1e-12)) / F.lit(127.0)).alias("q_scale"),
    )
    err_scaled = F.aggregate(
        F.transform(
            "embedding",
            lambda x: rlong(
                F.abs(xd(x) - rlong(xd(x) / F.col("q_scale")) * F.col("q_scale"))
                * F.lit(1e6)
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return base.select(
        "vec_id",
        "label",
        (rlong(F.col("q_scale") * F.lit(1e9)) / F.lit(1e9)).alias("q_scale_r"),
        (err_scaled / (F.size("embedding") * F.lit(1e6))).alias("mean_abs_err"),
    )


# --------------------------------------------------------------------------
# M78: length-bucketed micro-batching (padding-efficient batch layout)
# --------------------------------------------------------------------------

LB_BUCKET_TOKENS = 64  # length-bucket width in tokens
LB_BATCH_SIZE = 8  # docs per micro-batch


@query(
    "q_batch_by_length",
    oracle=f"""
WITH sized AS (
  SELECT doc_id, CAST(CEIL(n_chars / 4.0) AS BIGINT) AS n_tok
  FROM documents
), bucketed AS (
  SELECT doc_id, n_tok, n_tok // {LB_BUCKET_TOKENS} AS lbucket,
         ROW_NUMBER() OVER (PARTITION BY n_tok // {LB_BUCKET_TOKENS}
                            ORDER BY n_tok, doc_id) AS pos
  FROM sized
), batched AS (
  SELECT doc_id, n_tok, lbucket, (pos - 1) // {LB_BATCH_SIZE} AS batch_no
  FROM bucketed
)
SELECT lbucket, CAST(batch_no AS BIGINT) AS batch_no,
       COUNT(*) AS batch_docs,
       CAST(MAX(n_tok) AS BIGINT) AS pad_to,
       CAST(MAX(n_tok) * COUNT(*) - SUM(n_tok) AS BIGINT) AS wasted_tokens
FROM batched
GROUP BY 1, 2
""",
)
def q_batch_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M78: length-bucketed micro-batching — documents grouped into
    token-length buckets, sequence-ordered within each bucket, and cut
    into fixed-size batches; output reports each batch's pad-to length and
    wasted (padding) tokens. The layout step that makes training batches
    padding-efficient: batching random docs pads everything to the longest
    doc, bucketing first bounds waste to the bucket width.

    Scale shape: one window per length bucket (buckets are independent —
    partition-parallel, same shape as q_pack_sequences' bucketed streams);
    the batch aggregate is keyed by (bucket, batch). Nothing global: no
    total order across buckets is needed, so no single-partition sort
    exists at any scale."""
    d = table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", F.ceil(F.col("n_chars") / 4.0).cast("long").alias("n_tok")
    )
    bucketed = sized.withColumn(
        "lbucket", (F.col("n_tok") / LB_BUCKET_TOKENS).cast("long")
    )
    w = Window.partitionBy("lbucket").orderBy("n_tok", "doc_id")
    batched = bucketed.withColumn(
        "batch_no",
        ((F.row_number().over(w) - 1) / LB_BATCH_SIZE).cast("long"),
    )
    return batched.groupBy("lbucket", "batch_no").agg(
        F.count(F.lit(1)).alias("batch_docs"),
        F.max("n_tok").alias("pad_to"),
        (F.max("n_tok") * F.count(F.lit(1)) - F.sum("n_tok"))
        .cast("long")
        .alias("wasted_tokens"),
    )
