"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with struct metadata; the
Spark-side machinery that matters at scale — schema, partitioning,
Arrow batch shape, UDF signatures — is real and tested here. The codec
step itself is STUBBED (the image/audio libraries are not in this
container): `decode_image_stub` raises NotImplementedError, and the
deterministic fake parser stands in so the plumbing is end-to-end
testable (FIXTURES/multimodal note in the task brief).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgforge.sources import read_table

META_SCHEMA = T.StructType(
    [
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("head_checksum", T.LongType()),
    ]
)


def decode_image_stub(payload: bytes):  # pragma: no cover - deliberate stub
    """Real decoder entry point. Wire Pillow/ffmpeg here on a cluster
    with the codec libraries installed; the container lacks them."""
    raise NotImplementedError(
        "image/audio decode requires codec libraries not present in this "
        "environment; use fake_meta for the plumbing path"
    )


def fake_meta(payload: bytes | None):
    """Deterministic fake 'decode': byte length, first byte, and a
    checksum over the first 64 bytes — stands in for width/height/codec
    extraction with identical Spark-side plumbing."""
    if payload is None:
        return None
    head = payload[:64]
    return (len(payload), head[0] if head else 0, int(sum(head)) % 997)


def mm_extract_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas over binary batches — the per-partition batch-iterator
    shape a real frame-sampler/resizer uses (one Arrow batch in, one
    out, bounded memory per task)."""
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), *META_SCHEMA.fields]
    )

    def run(batches):
        for pdf in batches:
            metas = pdf[payload_col].map(fake_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": metas.map(lambda m: m[0] if m else None),
                    "first_byte": metas.map(lambda m: m[1] if m else None),
                    "head_checksum": metas.map(lambda m: m[2] if m else None),
                }
            )

    return df.mapInPandas(run, out_schema)


def mm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable variant: the binary payload is the utf-8 encoding
    of documents.text (deterministic in both engines), run through the
    REAL mapInPandas plumbing."""
    d = read_table(spark, "documents", sf_dir).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return mm_extract_meta(d).orderBy("doc_id")


# text is ASCII word-salad, so byte arithmetic == char arithmetic
ORACLE_MM_META = """
SELECT doc_id,
       CAST(length(text) AS INT) AS byte_len,
       CAST(ascii(text[1]) AS INT) AS first_byte,
       CAST(list_sum(list_transform(string_split(text[1:64], ''),
                                    c -> ascii(c))) % 997 AS BIGINT) AS head_checksum
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Resize / frame-sample / feature-extract plumbing.
#
# The codec call is a deterministic fake (this container has no
# image/audio libraries — decode_image_stub marks the real entry point),
# but everything Spark cares about is real: mapInPandas batch iterators,
# explicit output StructTypes, array columns for embeddings, explode for
# per-frame rows. Fake "dimensions" derive from byte length so the same
# arithmetic is expressible in the DuckDB oracle.
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_w", T.IntegerType()),
        T.StructField("orig_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
    ]
)

RESIZE_TARGET = 128


def fake_dims(n: int) -> tuple[int, int]:
    """Deterministic fake decode of image dimensions from payload size."""
    return 16 + n % 241, 16 + (n // 7) % 181


def mm_resize_batch(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Thumbnail-resize plumbing: decode dims, integer aspect-preserving
    scale to RESIZE_TARGET on the long side. One Arrow batch in/out."""

    def run(batches):
        for pdf in batches:
            lens = pdf[payload_col].map(lambda b: len(b) if b is not None else 0)
            w = 16 + lens % 241
            h = 16 + (lens // 7) % 181
            m = np.maximum(w, h)
            out_w = w.where(m <= RESIZE_TARGET, w * RESIZE_TARGET // m)
            out_h = h.where(m <= RESIZE_TARGET, h * RESIZE_TARGET // m)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_w": w.astype("int32"),
                    "orig_h": h.astype("int32"),
                    "out_w": out_w.astype("int32"),
                    "out_h": out_h.astype("int32"),
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, "documents", sf_dir).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return mm_resize_batch(d).orderBy("doc_id")


ORACLE_MM_RESIZE = """
WITH dims AS (
  SELECT doc_id,
         CAST(16 + length(text) % 241 AS INT) AS orig_w,
         CAST(16 + (length(text) // 7) % 181 AS INT) AS orig_h
  FROM documents
)
SELECT doc_id, orig_w, orig_h,
       CAST(CASE WHEN greatest(orig_w, orig_h) <= 128 THEN orig_w
            ELSE orig_w * 128 // greatest(orig_w, orig_h) END AS INT) AS out_w,
       CAST(CASE WHEN greatest(orig_w, orig_h) <= 128 THEN orig_h
            ELSE orig_h * 128 // greatest(orig_w, orig_h) END AS INT) AS out_h
FROM dims ORDER BY doc_id
"""


def mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for 'video' payloads: a fake stream of
    n_frames = 1 + byte_len % 97 frames, sampled at a stride that keeps
    <= 8 frames per doc, exploded to one row per sampled frame with its
    byte offset — the exact shape a real ffmpeg-backed sampler emits.
    Pure column arithmetic (sequence + explode), no UDF needed."""
    d = read_table(spark, "documents", sf_dir).select(
        "doc_id", F.length(F.encode("text", "UTF-8")).alias("byte_len")
    )
    f = d.select(
        "doc_id",
        (1 + F.col("byte_len") % 97).alias("n_frames"),
    ).select(
        "doc_id",
        "n_frames",
        F.greatest(F.lit(1), F.floor(F.col("n_frames") / 8).cast("int")).alias(
            "stride"
        ),
    )
    return (
        f.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.col("stride"))
            ).alias("frame_idx"),
        )
        .withColumn("frame_off", F.col("frame_idx").cast("long") * 1024)
        .orderBy("doc_id", "frame_idx")
    )


ORACLE_MM_FRAMES = """
WITH v AS (
  SELECT doc_id, 1 + length(text) % 97 AS n_frames FROM documents
),
s AS (
  SELECT doc_id, n_frames,
         greatest(1, CAST(floor(n_frames / 8) AS INT)) AS stride FROM v
)
SELECT doc_id,
       CAST(fi AS INT) AS frame_idx,
       CAST(fi AS BIGINT) * 1024 AS frame_off
FROM (SELECT doc_id, unnest(range(0, n_frames, stride)) AS fi FROM s)
ORDER BY doc_id, frame_idx
"""

EMBED_DIM = 8

EMBED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feat", T.ArrayType(T.DoubleType())),
    ]
)


def mm_embed_batch(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Feature-extraction plumbing: a deterministic fake 'model' maps the
    64-byte head checksum to an EMBED_DIM-dim vector. The real model
    slots into the same mapInPandas signature (binary batch in, float
    array batch out, bounded by Arrow batch size)."""

    def run(batches):
        for pdf in batches:
            cs = pdf[payload_col].map(
                lambda b: int(sum(b[:64])) % 997 if b is not None else 0
            )
            feats = cs.map(
                lambda c: [round((c * (i + 1)) % 101 / 100.0, 2) for i in range(EMBED_DIM)]
            )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feat": feats})

    return df.mapInPandas(run, EMBED_SCHEMA)


def mm_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, "documents", sf_dir).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    e = mm_embed_batch(d)
    # project the array to scalar columns so the value-hash compare is
    # column-order stable in both engines
    return e.select(
        "doc_id",
        *[F.element_at("feat", i + 1).alias(f"f{i}") for i in range(EMBED_DIM)],
    ).orderBy("doc_id")


ORACLE_MM_EMBED = """
WITH cs AS (
  SELECT doc_id,
         list_sum(list_transform(string_split(text[1:64], ''), c -> ascii(c))) % 997 AS c
  FROM documents
)
SELECT doc_id,
       round((c * 1) % 101 / 100.0, 2) AS f0,
       round((c * 2) % 101 / 100.0, 2) AS f1,
       round((c * 3) % 101 / 100.0, 2) AS f2,
       round((c * 4) % 101 / 100.0, 2) AS f3,
       round((c * 5) % 101 / 100.0, 2) AS f4,
       round((c * 6) % 101 / 100.0, 2) AS f5,
       round((c * 7) % 101 / 100.0, 2) AS f6,
       round((c * 8) % 101 / 100.0, 2) AS f7
FROM cs ORDER BY doc_id
"""


QUERIES = {
    "mm_meta": mm_meta,
    "mm_resize": mm_resize,
    "mm_frames": mm_frames,
    "mm_embed": mm_embed,
}
ORACLES = {
    "mm_meta": ORACLE_MM_META,
    "mm_resize": ORACLE_MM_RESIZE,
    "mm_frames": ORACLE_MM_FRAMES,
    "mm_embed": ORACLE_MM_EMBED,
}
