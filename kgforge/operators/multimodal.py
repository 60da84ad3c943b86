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


QUERIES = {"mm_meta": mm_meta}
ORACLES = {"mm_meta": ORACLE_MM_META}
