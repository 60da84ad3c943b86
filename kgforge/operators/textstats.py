"""Text-analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

All four stay JVM-side (built-in string/array functions inside
whole-stage codegen) — text analysis is the hot path of a training-data
pipeline and must not drop into Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.sources import read_table

# tiny stopword lists per language — the n-gram-heuristic evidence
EN_STOP = ["the", "a", "data"]
FP_MOD = 1_000_000_007
FP_BASE = 131


def tx_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-hit voting over whitespace tokens.
    A real deployment swaps the word lists for charset n-gram tables;
    the plan shape (split -> filter -> ratio -> when-chain) is identical."""
    d = read_table(spark, "documents", sf_dir)
    words = F.split(F.col("text"), " ")
    en_hits = F.size(F.filter(words, lambda w: w.isin(*EN_STOP)))
    ratio = F.round(en_hits / F.size(words), 9)
    return d.select(
        "doc_id",
        "lang",
        en_hits.alias("en_hits"),
        ratio.alias("en_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
    ).orderBy("doc_id")


ORACLE_TX_LANGID = """
SELECT doc_id, lang,
       CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','data'))) AS INT) AS en_hits,
       ROUND(CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','data'))) AS DOUBLE)
             / len(string_split(text,' ')), 9) AS en_ratio,
       CASE WHEN CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','data'))) AS DOUBLE)
                 / len(string_split(text,' ')) >= 0.05
            THEN 'en' ELSE 'unk' END AS lang_pred
FROM documents ORDER BY doc_id
"""


def tx_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, word count, mean word length, stopword
    ratio, composite keep/drop flag — the C4-style filter battery."""
    d = read_table(spark, "documents", sf_dir)
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_chars = F.length("text")
    mean_wl = F.round((n_chars - (n_words - 1)) / n_words, 9)
    stop_ratio = F.round(
        F.size(F.filter(words, lambda w: w.isin(*EN_STOP))) / n_words, 9
    )
    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        stop_ratio.alias("stop_ratio"),
        (
            (n_words >= 10) & (mean_wl >= 2.0) & (mean_wl <= 12.0)
        ).alias("keep"),
    ).orderBy("doc_id")


ORACLE_TX_QUALITY = """
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars,
       CAST(len(string_split(text,' ')) AS INT) AS n_words,
       ROUND(CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
             / len(string_split(text,' ')), 9) AS mean_word_len,
       ROUND(CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','data'))) AS DOUBLE)
             / len(string_split(text,' ')), 9) AS stop_ratio,
       (len(string_split(text,' ')) >= 10
        AND (CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
             / len(string_split(text,' '))) BETWEEN 2.0 AND 12.0) AS keep
FROM documents ORDER BY doc_id
"""


def tx_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens and BPE-ish regex tokens
    (\\w+ runs and single non-space symbols) — the budget estimator for
    a tokenizer-bound training pipeline."""
    d = read_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_\\s]', 0)")).alias(
            "re_tokens"
        ),
    ).orderBy("doc_id")


ORACLE_TX_TOKENS = r"""
SELECT doc_id,
       CAST(len(string_split(text,' ')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]', 0)) AS INT) AS re_tokens
FROM documents ORDER BY doc_id
"""


def tx_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: rolling polynomial hash over characters,
    h = (h*131 + ascii(c)) mod 1e9+7 — deterministic, associative-free
    left fold via F.aggregate; engine-portable (the oracle reproduces it
    bit-for-bit with list_reduce)."""
    d = read_table(spark, "documents", sf_dir)
    chars = F.split(F.col("text"), "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )
    return d.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


ORACLE_TX_FINGERPRINT = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (acc, x) -> (acc * 131 + x) % 1000000007) AS fingerprint
FROM documents ORDER BY doc_id
"""


QUERIES = {
    "tx_langid": tx_langid,
    "tx_quality": tx_quality,
    "tx_tokens": tx_tokens,
    "tx_fingerprint": tx_fingerprint,
}

ORACLES = {
    "tx_langid": ORACLE_TX_LANGID,
    "tx_quality": ORACLE_TX_QUALITY,
    "tx_tokens": ORACLE_TX_TOKENS,
    "tx_fingerprint": ORACLE_TX_FINGERPRINT,
}
