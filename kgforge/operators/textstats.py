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


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style intra-document repetition signals over docs(doc_id,
    text): n_words, n_distinct_words, and the duplicate fraction of
    words / adjacent 2-grams / adjacent 3-grams — the standard "is this
    page boilerplate or a keyboard-mash" battery a training-data
    pipeline runs before dedup (Rae et al. 2021 repetition filters).

    Everything stays inside whole-stage codegen: the n-grams are
    array-slot arithmetic over the split words (no explode, no
    shuffle), and each fraction is one IEEE division of exactly-
    representable integer counts, so the values are bit-identical to
    the SQL oracle's. Empty-gram guards: a 1-word doc has no 2-grams
    (fraction 0.0 by definition, not NULL).

    The split is materialized as a column FIRST: element_at inside a
    transform lambda does not get subexpression-eliminated against an
    unmaterialized split(text), so referencing the raw split there
    re-splits the text per array slot — O(words^2) per document,
    measured 17s -> ~1s at sf0.1 for this exact operator."""
    words = F.col("ws")
    n = F.size(words)
    n_dist = F.size(F.array_distinct(words))

    def gram_dup_frac(k: int):
        cnt = n - (k - 1)  # adjacent k-grams in an n-word doc
        grams = F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(k)]
            ),
        )
        return F.when(
            n >= k,
            (cnt - F.size(F.array_distinct(grams))).cast("double") / cnt,
        ).otherwise(F.lit(0.0))

    return docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    ).select(
        "doc_id",
        n.cast("long").alias("n_words"),
        n_dist.cast("long").alias("n_distinct_words"),
        ((n - n_dist).cast("double") / n).alias("dup_word_frac"),
        gram_dup_frac(2).alias("dup_2gram_frac"),
        gram_dup_frac(3).alias("dup_3gram_frac"),
    )


def tx_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, "documents", sf_dir)
    return repetition_stats(d).orderBy("doc_id")


def _gram_sql(k: int) -> str:
    """DuckDB twin of gram_dup_frac: 1-based list slots, range() is
    end-exclusive so range(1, n-k+2) enumerates the n-k+1 gram starts."""
    join = " || ' ' || ".join(f"ws[i+{j}]" for j in range(k))
    return (
        f"CASE WHEN len(ws) >= {k} THEN "
        f"CAST(len(ws)-{k - 1} - len(list_distinct(list_transform("
        f"range(1, len(ws)-{k - 1}+1), i -> {join}))) AS DOUBLE)"
        f" / (len(ws)-{k - 1}) ELSE 0.0 END"
    )


ORACLE_TX_REPETITION = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
       CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws) AS dup_word_frac,
       {_gram_sql(2)} AS dup_2gram_frac,
       {_gram_sql(3)} AS dup_3gram_frac
FROM w ORDER BY doc_id
"""


# ---- driver-facing compound ------------------------------------------
# The five tx_* operators melt into ONE registered query (tx_stats) via
# the same machinery as relational's compounds — every cell of every
# standalone result is still value-hash-compared against the
# identically-melted DuckDB oracle; the standalones stay in QUERIES for
# bench.py and pytest. This freed 3 driver-registry slots (the cap is
# ~50 recorded rows) for dd_passage / dd_url / kg_assoc.

_TX_CELLS = {
    "tx_langid": (
        None, ["doc_id"],
        [("lang", "s"), ("en_hits", "n"), ("en_ratio", "n"), ("lang_pred", "s")],
    ),
    "tx_quality": (
        None, ["doc_id"],
        [("n_chars", "n"), ("n_words", "n"), ("mean_word_len", "n"),
         ("stop_ratio", "n"), ("keep", "s")],
    ),
    "tx_tokens": (None, ["doc_id"], [("ws_tokens", "n"), ("re_tokens", "n")]),
    "tx_fingerprint": (None, ["doc_id"], [("fingerprint", "n")]),
    "tx_repetition": (
        None, ["doc_id"],
        [("n_words", "n"), ("n_distinct_words", "n"), ("dup_word_frac", "n"),
         ("dup_2gram_frac", "n"), ("dup_3gram_frac", "n")],
    ),
}


def tx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound text-analysis bundle: language-ID, quality battery,
    token counts, rolling-hash fingerprint, repetition signals — the
    standalone tx_* queries melted into one oracle-checked frame."""
    from kgforge.operators.relational import _compound

    specs = [
        (sec, QUERIES[sec], flt, keys, cells)
        for sec, (flt, keys, cells) in _TX_CELLS.items()
    ]
    return _compound(spark, sf_dir, specs)


QUERIES = {
    "tx_langid": tx_langid,
    "tx_quality": tx_quality,
    "tx_tokens": tx_tokens,
    "tx_fingerprint": tx_fingerprint,
    "tx_repetition": tx_repetition,
}

ORACLES = {
    "tx_langid": ORACLE_TX_LANGID,
    "tx_quality": ORACLE_TX_QUALITY,
    "tx_tokens": ORACLE_TX_TOKENS,
    "tx_fingerprint": ORACLE_TX_FINGERPRINT,
    "tx_repetition": ORACLE_TX_REPETITION,
}


def _tx_compound_sql() -> str:
    from kgforge.operators.relational import _compound_sql

    return _compound_sql(
        [
            (sec, ORACLES[sec], flt, keys, cells)
            for sec, (flt, keys, cells) in _TX_CELLS.items()
        ]
    )


QUERIES["tx_stats"] = tx_stats
ORACLES["tx_stats"] = _tx_compound_sql()

# the names __spark_entry__ registers (the standalones above remain for
# bench.py, tools/verify_local.py and pytest)
DRIVER_QUERIES = ["tx_stats"]
