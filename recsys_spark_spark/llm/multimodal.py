"""3.J multimodal — opaque binary payloads with typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque `binary`
column that never leaves the executors; metadata (shape, codec, checksum)
travels in typed columns; decode/feature-extraction runs as Arrow-batched
mapInPandas so one Python worker processes a whole batch.

No media libraries exist in this container, so the decode step is a
clearly-marked deterministic stub (_fake_decode) — the Spark-side plumbing
(schema, batching, partition layout, UDF signature) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recsys_spark_spark.catalog import table
from recsys_spark_spark.functions.determinism import rlong
from recsys_spark_spark.registry import query


@query(
    "q_multimodal_join",
    oracle=f"""
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars, e.label,
       ROUND(SQRT(SUM(CAST(ROUND(CAST(e.embedding[gs.i] AS DOUBLE)
                                 * CAST(e.embedding[gs.i] AS DOUBLE) * 1e12, 0) AS BIGINT))
                  / 1e12), 6) AS emb_norm
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
CROSS JOIN generate_series(1, 64) gs(i)
GROUP BY 1, 2, 3, 4
""",
)
def q_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: text ⋈ vector modality join (doc_id = vec_id) with per-row
    embedding stats, flattened to top-level columns (struct output hashes
    differently across engines — SURVEY.md §7.5)."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    prods = F.zip_with(
        F.col("embedding"),
        F.col("embedding"),
        lambda x, y: rlong(x.cast("double") * y.cast("double") * F.lit(1e12)),
    )
    norm_s = F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)
    joined = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        "label",
        F.round(F.sqrt(norm_s / F.lit(1e12)), 6).alias("emb_norm"),
    )
    return joined


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """STUB decoder — stands in for image/audio decode (no media libs in this
    container). Deterministic: derives (width, height, mean_intensity) from
    the payload's sha1. A real deployment swaps in PIL/ffmpeg here; the
    dataflow around it is unchanged."""
    h = hashlib.sha1(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    mean_intensity = round(int.from_bytes(h[2:4], "big") / 65535.0, 6)
    return width, height, mean_intensity


@query("q_multimodal_features")  # rows-only: stubbed decoder, not SQL-expressible
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-mm: binary-column feature extraction via Arrow-batched mapInPandas.

    documents.text is encoded to a binary payload column (standing in for an
    image blob), then 'decoded' per batch. At scale: repartition by a
    size-balancing key first so decode batches are even."""

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series([f[0] for f in feats], dtype="int64"),
                    "height": pd.Series([f[1] for f in feats], dtype="int64"),
                    "mean_intensity": pd.Series([f[2] for f in feats], dtype="float64"),
                }
            )

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(
        decode_batch,
        "doc_id long, payload_bytes long, width long, height long, mean_intensity double",
    )


def _fake_frame_count(payload: bytes) -> int:
    """STUB container probe — stands in for reading a video header."""
    return 1 + payload[0] % 7 if payload else 1


FRAME_STRIDE = 2


@query("q_multimodal_frames")  # rows-only: stubbed decoder, not SQL-expressible
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-mm2: video-shaped frame sampling — the fan-OUT mapInPandas shape
    (one input row → several frame rows), complementing q_multimodal_features'
    1:1 shape.

    The payload stands in for a video container; every FRAME_STRIDE-th frame
    is 'decoded' (deterministic stub — a real deployment swaps in
    ffmpeg/pyav) into per-frame features. The Arrow batch contract is the
    part that matters at 100 TB: the worker expands each batch in pandas
    (no per-row Python round-trips), output rows carry (doc_id, frame_idx)
    so downstream joins/apply steps stay shuffle-keyed, and a
    size-balancing repartition upstream keeps decode batches even."""

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list[int] = []
            frame_idxs: list[int] = []
            feats: list[float] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = _fake_frame_count(payload)
                for idx in range(0, n, FRAME_STRIDE):
                    h = hashlib.sha1(payload + idx.to_bytes(4, "big")).digest()
                    doc_ids.append(doc_id)
                    frame_idxs.append(idx)
                    feats.append(round(int.from_bytes(h[:4], "big") / 2**32, 6))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(frame_idxs, dtype="int64"),
                    "frame_feature": pd.Series(feats, dtype="float64"),
                }
            )

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(sample_frames, "doc_id long, frame_idx long, frame_feature double")


# --------------------------------------------------------------------------
# J-mm3: resize transform (1 -> 1 binary-to-binary with metadata)
# --------------------------------------------------------------------------

RESIZE_TARGET = 32  # target long-edge "pixels" for the stub


def _fake_resize(payload: bytes, target: int) -> tuple[bytes, int, int]:
    """STUB resizer — stands in for an image resample (no media libs in
    this container). Deterministic: the 'resized' payload is a sha1-keyed
    byte string whose length scales with target², and the output dims
    preserve the fake aspect ratio from _fake_decode. A real deployment
    swaps in PIL's resize; everything around it is unchanged."""
    w, h, _ = _fake_decode(payload)
    scale = target / max(w, h)
    out_w, out_h = max(1, round(w * scale)), max(1, round(h * scale))
    seed = hashlib.sha1(payload + target.to_bytes(2, "big")).digest()
    out = (seed * ((out_w * out_h) // len(seed) + 1))[: out_w * out_h]
    return out, out_w, out_h


@query("q_multimodal_resize")  # rows-only: stubbed resampler, not SQL-expressible
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-mm3: binary-to-binary resize — the 1→1 media transform shape that
    completes the multimodal plumbing set (decode = q_multimodal_features,
    frame-sample = q_multimodal_frames). The payload goes IN as binary and
    comes OUT as binary plus new dimension metadata, through one
    Arrow-batched mapInPandas pass — the pattern for any re-encode step
    (resize, transcode, crop) in a 100 TB media pipeline: per-row, schema-
    stable, shuffle-free, with the output column typed `binary` so
    downstream stages chain the same way. Output asserts ride the emitted
    dims/bytes (tests), since the stub resampler is not SQL-expressible."""

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = [_fake_resize(p, RESIZE_TARGET) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": [o[0] for o in outs],
                    "out_w": pd.Series([o[1] for o in outs], dtype="int64"),
                    "out_h": pd.Series([o[2] for o in outs], dtype="int64"),
                    "out_bytes": pd.Series(
                        [len(o[0]) for o in outs], dtype="int64"
                    ),
                }
            )

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(
        resize_batch,
        "doc_id long, resized binary, out_w long, out_h long, out_bytes long",
    )
