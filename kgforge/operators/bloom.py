"""Blocked Bloom filter as pure DataFrame operators.

The scale problem this solves: a new-batch-vs-base join (incremental
dedup, frontier membership, decontamination) shuffles the BASE side by
the join key even when almost none of its keys occur in the batch. A
semi-join against the batch's key set fixes that only while the key set
is broadcastable; at web scale a batch carries millions of band keys.
A Bloom filter is the constant-size stand-in: build a bitmap over one
side's keys, broadcast the bitmap, and drop definitely-absent rows from
the other side MAP-SIDE, before any exchange. False positives are safe
by construction — they just survive to the exact join that was going to
run anyway; false negatives cannot happen.

Design: register-blocked ("split-block") bloom, the Parquet/Impala
layout — all k bits of a key live in ONE 64-bit word, selected by the
low hash bits, so membership is a single broadcast equi-join on the
word index plus one bitwise AND. Build is one hash-aggregate
(`bit_or` of per-key masks) producing <= n_words rows; map-side partial
aggregation collapses each executor's contribution to the bitmap size
before the (tiny) shuffle. No Python evaluation anywhere — the hash,
mask, and membership test are all whole-stage-codegen expressions.

Two hash flavors:
- `h60_md5(col)`: first 60 bits of md5, engine-portable — DuckDB
  reproduces it bit-for-bit (same device as dd_simhash_verify), which
  is what lets the dd_bloom driver query hash-match an oracle that
  recomputes the FILTER ITSELF, false positives included.
- `h64_xx(*cols)`: xxhash64 folded non-negative — the cheap production
  path used by the incremental pipeline.

Reference analog: the codelist membership predicates the emitters push
ahead of their big joins (Oracle/PCORNetLoader_ora.sql:1118,1202) —
same role, constant-size and broadcast-safe at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_WORDS = 1 << 14  # default bitmap: 16384 words = 1 Mbit = 128 KiB
BLOOM_K = 3  # bits set per key (within the key's word)

_HASH = "_bf_h"
_WIDX = "_bf_w"
_MASK = "_bf_m"
_BITS = "_bf_bits"


def h60_md5(col) -> F.Column:
    """Non-negative 60-bit hash: first 15 hex digits of md5. DuckDB twin
    (bit-identical, validated): list_sum over strpos-decoded hex digits
    — see ORACLE_DD_BLOOM in operators/dedup.py."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h64_xx(*cols) -> F.Column:
    """Non-negative 62-bit xxhash64 — the fast path (no cross-engine
    oracle; JVM-only). Masks the sign bit rather than abs() so
    Long.MIN_VALUE cannot slip through."""
    return F.xxhash64(*cols).bitwiseAND(F.lit((1 << 62) - 1))


def _word_and_mask(df: DataFrame, hash_col: F.Column, n_words: int, k: int) -> DataFrame:
    """Attach the word index (low hash bits) and the k-bit in-word mask
    (successive 6-bit hash slices above the index bits) as columns."""
    # bit position capped to 0..62: DuckDB raises on 1::BIGINT << 63
    # (signed overflow) where the JVM wraps, so position 63 is unusable
    # cross-engine; % 63 keeps both engines in defined territory
    mask_sql = " | ".join(
        f"shiftleft(CAST(1 AS BIGINT), CAST((({_HASH} >> {6 * j}) & 63) % 63 AS INT))"
        for j in range(1, k + 1)
    )
    return (
        df.withColumn(_HASH, hash_col)
        .withColumn(_WIDX, F.col(_HASH) % n_words)
        .withColumn(_MASK, F.expr(mask_sql))
    )


def bloom_build(
    df: DataFrame, hash_col: F.Column, n_words: int = BLOOM_WORDS, k: int = BLOOM_K
) -> DataFrame:
    """Bitmap over df's keys: <= n_words rows of (word_idx, bits).
    One hash aggregation; partial bit_or keeps the shuffle at bitmap
    size per input partition regardless of key count."""
    return (
        _word_and_mask(df, hash_col, n_words, k)
        .select(F.col(_WIDX).alias("word_idx"), F.col(_MASK).alias("mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    hash_col: F.Column,
    bloom: DataFrame,
    n_words: int = BLOOM_WORDS,
    k: int = BLOOM_K,
    out_col: str = "bloom_pass",
) -> DataFrame:
    """Membership test: adds `out_col` (boolean; True = maybe present,
    False = DEFINITELY absent). One broadcast left join on the word
    index — the probed side is never shuffled — plus one AND. A word
    missing from the bitmap frame means no key hashed there: absent."""
    probed = _word_and_mask(df, hash_col, n_words, k).join(
        F.broadcast(bloom.withColumnRenamed("word_idx", _WIDX).withColumnRenamed("bits", _BITS)),
        _WIDX,
        "left",
    )
    hit = F.col(_BITS).bitwiseAND(F.col(_MASK)) == F.col(_MASK)
    return probed.withColumn(out_col, F.coalesce(hit, F.lit(False))).drop(
        _HASH, _WIDX, _MASK, _BITS
    )


def bloom_prune(
    df: DataFrame,
    hash_col: F.Column,
    bloom: DataFrame,
    n_words: int = BLOOM_WORDS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Drop rows whose key is definitely absent from the bloom — the
    map-side prefilter to put in front of a shuffle join. Output schema
    equals input schema (the flag column is consumed by the filter)."""
    out = bloom_probe(df, hash_col, bloom, n_words, k, out_col="_bf_pass")
    return out.filter(F.col("_bf_pass")).drop("_bf_pass")
