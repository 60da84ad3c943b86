"""Text-analysis operators for the training-data pipeline: language-ID,
quality scoring, token counting, document fingerprinting, repetition
signals, benchmark decontamination, and deterministic stratified
sampling / mixture reporting.

Everything stays JVM-side (built-in string/array functions inside
whole-stage codegen) — text analysis is the hot path of a training-data
pipeline and must not drop into Python per row. The one join in the
family (decontam's eval-gram match) is a broadcast semi-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgforge.sources import read_table

# tiny stopword lists per language — the n-gram-heuristic evidence
EN_STOP = ["the", "a", "data"]
FP_MOD = 1_000_000_007
FP_BASE = 131



def _docs_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents read spread across cores (r06): the local fixture is
    ONE parquet row group, so every scan-heavy operator otherwise runs
    its per-doc array work on a single task. Used by the compute-heavy
    tx_ wrappers; the trivial ones keep the plain scan (the shuffle
    would cost more than it buys). A 100-TB table arrives as thousands
    of splits and skips this."""
    return read_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )

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
    )


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
    )


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
    )


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
    d = _docs_fanout(spark, sf_dir)
    chars = F.split(F.col("text"), "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


ORACLE_TX_FINGERPRINT = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (acc, x) -> (acc * 131 + x) % 1000000007) AS fingerprint
FROM documents ORDER BY doc_id
"""


def decontam(docs: DataFrame, k: int = 13, eval_mod: int = 23) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word-k-gram (k=13, the GPT-3 appendix-C convention) with an eval
    set. The eval set is synthesized deterministically from the corpus
    itself — a 20-word snippet (words 3..22) of every doc whose id is
    divisible by eval_mod — so the operator is self-contained and both
    engines construct the identical benchmark.

    100-TB shape: eval-set gram hashes are tiny (benchmarks are KBs,
    corpora are TBs) and BROADCAST to every executor; the per-doc gram
    explode is map-side and immediately pruned by the broadcast
    left-semi join, so the only shuffle is the groupBy over the matched
    rows (≈ contamination rate × docs, a sliver); the final all-docs
    left join broadcasts the per-doc hit counts for the same reason.
    Grams travel as md5 hex (16 bytes hashed) — the raw 13-word strings
    never shuffle. The word split materializes as a column before the
    transform lambda (CSE — see repetition_stats below)."""
    base = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))

    def gram_hashes(df: DataFrame) -> DataFrame:
        n = F.size(F.col("ws"))
        grams = F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.md5(
                F.concat_ws(" ", *[F.element_at(F.col("ws"), i + j) for j in range(k)])
            ),
        )
        return df.filter(n >= k).select(
            "doc_id", F.explode(F.array_distinct(grams)).alias("gh")
        )

    snips = base.filter(
        (F.col("doc_id") % eval_mod == 0) & (F.size("ws") >= 22)
    ).select("doc_id", F.slice("ws", 3, 20).alias("ws"))
    bench_grams = gram_hashes(snips).select("gh").distinct()
    hits = (
        gram_hashes(base)
        .join(F.broadcast(bench_grams), "gh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("gh").alias("n_contam_grams"))
    )
    return (
        docs.select("doc_id")
        .join(F.broadcast(hits), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contam_grams", F.lit(0)).cast("long").alias("n_contam_grams"),
            (F.coalesce("n_contam_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def tx_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_fanout(spark, sf_dir)
    return decontam(d)


def _gram13_sql(arr: str) -> str:
    return " || ' ' || ".join(f"{arr}[i+{j}]" for j in range(13))


ORACLE_TX_DECONTAM = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
snip AS (SELECT doc_id, list_slice(ws, 3, 22) AS ws FROM w
         WHERE doc_id % 23 = 0 AND len(ws) >= 22),
bg AS (SELECT DISTINCT md5(g) AS gh FROM (
         SELECT unnest(list_transform(range(1, len(ws) - 11),
                       i -> {_gram13_sql("ws")})) AS g
         FROM snip WHERE len(ws) >= 13)),
dg AS (SELECT doc_id,
              unnest(list_distinct(list_transform(range(1, len(ws) - 11),
                     i -> md5({_gram13_sql("ws")})))) AS gh
       FROM w WHERE len(ws) >= 13),
hits AS (SELECT doc_id, count(*) AS n FROM dg JOIN bg USING (gh) GROUP BY doc_id)
SELECT w.doc_id,
       CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_contam_grams,
       COALESCE(hits.n, 0) > 0 AS contaminated
FROM w LEFT JOIN hits ON w.doc_id = hits.doc_id
ORDER BY w.doc_id
"""


# deterministic multiplicative-hash sampler (Knuth 2654435761 mod 2^32):
# the per-doc decision is a pure function of doc_id, so re-running the
# pipeline (or running it on two cluster sizes) selects the identical
# training subset — no RNG state, no seed plumbing, no driver round-trip.
SAMPLE_A = 2654435761
SAMPLE_MOD = 1 << 32


def _sample_cols():
    bucket = (F.col("doc_id") * F.lit(SAMPLE_A)) % F.lit(SAMPLE_MOD) % 1000
    rate = F.lit(950) - F.lit(45) * (
        F.expr("CAST(substring(source, 4) AS INT)") % 20
    )
    return bucket.alias("bucket"), rate.alias("rate_permille")


def tx_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-mix construction:
    each source stratum gets a per-mille rate (950 - 45·(idx mod 20) —
    a fixed descending ladder standing in for a tuned mixture config),
    and a doc is kept iff its multiplicative-hash bucket falls under the
    stratum's rate. Pure whole-stage codegen, zero shuffle, zero RNG —
    the 100-TB version is this exact plan with the ladder swapped for a
    broadcast config map."""
    d = read_table(spark, "documents", sf_dir)
    bucket, rate = _sample_cols()
    return (
        d.select("doc_id", "source", bucket, rate)
        .select(
            "doc_id", "source", "bucket", "rate_permille",
            (F.col("bucket") < F.col("rate_permille")).alias("sampled"),
        )
    )


ORACLE_TX_SAMPLE = """
SELECT doc_id, source,
       (doc_id * 2654435761) % 4294967296 % 1000 AS bucket,
       950 - 45 * (CAST(substr(source, 4) AS INT) % 20) AS rate_permille,
       (doc_id * 2654435761) % 4294967296 % 1000
         < 950 - 45 * (CAST(substr(source, 4) AS INT) % 20) AS sampled
FROM documents ORDER BY doc_id
"""


def tx_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix report: per stratum, how many docs the sampler kept,
    the achieved per-mille rate, and the whitespace-token budget the
    kept docs contribute — the numbers a data-mixture owner reads before
    launching a run. One shuffle on the (tiny) stratum key."""
    d = read_table(spark, "documents", sf_dir)
    bucket, rate = _sample_cols()
    n_words = F.size(F.split(F.col("text"), " "))
    rows = d.select(
        "source",
        (bucket.cast("long") < rate).alias("sampled"),
        n_words.alias("n_words"),
    )
    n_sampled = F.sum(F.when(F.col("sampled"), 1).otherwise(0))
    return (
        rows.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            n_sampled.cast("long").alias("n_sampled"),
            (n_sampled.cast("double") * 1000.0 / F.count(F.lit(1))).alias(
                "achieved_permille"
            ),
            F.sum(F.when(F.col("sampled"), F.col("n_words")).otherwise(0))
            .cast("long")
            .alias("tok_sampled"),
        )
        .orderBy("source")
    )


ORACLE_TX_MIX = """
WITH s AS (
  SELECT source,
         (doc_id * 2654435761) % 4294967296 % 1000
           < 950 - 45 * (CAST(substr(source, 4) AS INT) % 20) AS sampled,
         len(string_split(text, ' ')) AS n_words
  FROM documents)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS DOUBLE) * 1000.0
         / count(*) AS achieved_permille,
       CAST(sum(CASE WHEN sampled THEN n_words ELSE 0 END) AS BIGINT) AS tok_sampled
FROM s GROUP BY source ORDER BY source
"""


def pack_docs(docs: DataFrame, n_shards: int = 64, seq_len: int = 2048) -> DataFrame:
    """Sequence packing for pretraining: concatenate documents in a
    deterministic order and chunk the token stream into fixed-length
    training sequences (the GPT concat-and-chunk discipline). Each doc
    reports the shard it packs into, its start offset in the shard's
    token stream, and the training-sequence index that offset lands in.

    100-TB shape: the stream is SHARDED (multiplicative hash of doc_id
    mod n_shards) and the cumulative-sum window partitions by shard —
    the only shuffle is the window exchange on the shard key, and each
    window partition is corpus/n_shards (the knob: 64 here, ~100k at
    100 TB keeps partitions ~1 GB). A single global window would
    funnel the corpus through one reducer; this never does."""
    from pyspark.sql import Window

    n_tok = F.size(F.split(F.col("text"), " "))
    rows = docs.select(
        "doc_id",
        ((F.col("doc_id") * F.lit(SAMPLE_A)) % F.lit(SAMPLE_MOD) % n_shards).alias(
            "shard"
        ),
        n_tok.cast("long").alias("n_tok"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    start = (F.sum("n_tok").over(w) - F.col("n_tok")).cast("long")
    return rows.select(
        "doc_id", "shard", "n_tok",
        start.alias("start_off"),
        F.floor(start / F.lit(seq_len)).cast("long").alias("seq_id"),
    )


def tx_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_docs(read_table(spark, "documents", sf_dir))


ORACLE_TX_PACK = """
WITH s AS (
  SELECT doc_id,
         (doc_id * 2654435761) % 4294967296 % 64 AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents)
SELECT doc_id, shard, n_tok,
       CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) - n_tok AS BIGINT)
         AS start_off,
       CAST(FLOOR((sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) - n_tok)
            / 2048.0) AS BIGINT) AS seq_id
FROM s ORDER BY doc_id
"""


def redact(docs: DataFrame) -> DataFrame:
    """PII redaction battery: count and scrub emails and IPv4 literals
    (the Dolma/ROOTS-style pre-release scrub). The test corpus is
    synthetic word salad with no organic PII, so — exactly like
    dd_url's messy-variant synthesis — each doc is first augmented
    with a deterministic contact line derived from its own doc_id;
    both engines build the identical augmented text, then both run the
    identical scrub, so survivors are guaranteed at every sf and the
    check can never pass vacuously as 0=0.

    All regexp work is JVM-side codegen; the melted cell carries the
    md5 of the redacted text, not the text itself."""
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), (F.col("doc_id") % 100).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" and admin@test.org")).otherwise(
            F.lit("")
        ),
    )
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    ip_re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    redacted = F.regexp_replace(
        F.regexp_replace(aug, email_re, "<EMAIL>"), ip_re, "<IP>"
    )
    # patterns go through F.lit, not F.expr: a SQL string literal would
    # unescape '\.' to '.' and silently loosen the regex
    return docs.select(
        "doc_id", aug.alias("_aug"), redacted.alias("_red")
    ).select(
        "doc_id",
        F.size(F.regexp_extract_all("_aug", F.lit(email_re), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("_aug", F.lit(ip_re), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.md5("_red").alias("redacted_md5"),
    )


def tx_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_fanout(spark, sf_dir)
    return redact(d)


ORACLE_TX_REDACT = r"""
WITH a AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.' || CAST(doc_id % 100 AS VARCHAR)
              || CASE WHEN doc_id % 3 = 0 THEN ' and admin@test.org' ELSE '' END
           AS aug
  FROM documents),
r AS (
  SELECT doc_id, aug,
         regexp_replace(
           regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                          '<EMAIL>', 'g'),
           '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS red
  FROM a)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', 0)) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(aug,
            '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', 0)) AS BIGINT)
         AS n_ips,
       md5(red) AS redacted_md5
FROM r ORDER BY doc_id
"""


def tx_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel report: how many documents each ingest gate drops
    FIRST (language-ID, repetition, sampler — ordered as the pipeline
    applies them) and how many remain after each stage — the number a
    filter-pipeline owner reads to see which gate is doing the work.
    Gate thresholds chosen so every stage fires on the synthetic corpus
    at every sf (a stage that can only ever report 0 proves nothing —
    the rel_anti_join lesson).

    One codegen pass computes each doc's first-failing gate, one tiny
    aggregation groups by it; the cumulative window runs over the ≤4
    stage rows, so the single-partition window is O(stages), never
    O(corpus)."""
    d = read_table(spark, "documents", sf_dir)
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    en_ratio = F.size(F.filter(words, lambda w: w.isin(*EN_STOP))) / n
    dup_frac = (n - F.size(F.array_distinct(words))).cast("double") / n
    bucket, rate = _sample_cols()
    stage = (
        F.when(en_ratio < 0.05, F.lit("1_langid"))
        .when(dup_frac > 0.6, F.lit("2_repetition"))
        .when(F.col("b") >= F.col("r"), F.lit("3_sample"))
        .otherwise(F.lit("4_kept"))
    )
    from pyspark.sql import Window

    counted = (
        d.select("doc_id", "text", bucket.alias("b"), rate.alias("r"))
        .select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_first_fail"))
    )
    drops = F.when(F.col("stage") == "4_kept", F.lit(0)).otherwise(
        F.col("n_first_fail")
    )
    w_cum = Window.orderBy("stage").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("stage").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return counted.select(
        "stage",
        F.col("n_first_fail").cast("long").alias("n_first_fail"),
        (F.sum("n_first_fail").over(w_all) - F.sum(drops).over(w_cum))
        .cast("long")
        .alias("n_remaining_after"),
    ).orderBy("stage")


ORACLE_TX_FUNNEL = """
WITH s AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','data'))) AS DOUBLE)
           / len(string_split(text,' ')) AS en_ratio,
         CAST(len(string_split(text,' ')) - len(list_distinct(string_split(text,' '))) AS DOUBLE)
           / len(string_split(text,' ')) AS dup_frac,
         (doc_id * 2654435761) % 4294967296 % 1000 AS b,
         950 - 45 * (CAST(substr(source, 4) AS INT) % 20) AS r
  FROM documents),
st AS (
  SELECT CASE WHEN en_ratio < 0.05 THEN '1_langid'
              WHEN dup_frac > 0.6 THEN '2_repetition'
              WHEN b >= r THEN '3_sample'
              ELSE '4_kept' END AS stage
  FROM s),
g AS (SELECT stage, CAST(count(*) AS BIGINT) AS n_first_fail FROM st GROUP BY stage)
SELECT stage, n_first_fail,
       CAST(sum(n_first_fail) OVER ()
            - sum(CASE WHEN stage = '4_kept' THEN 0 ELSE n_first_fail END)
              OVER (ORDER BY stage ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS n_remaining_after
FROM g ORDER BY stage
"""


VOCAB_TOPK = 100
BPE_TOPK = 50
CLS_DIM = 64  # hashed-feature dimension of the linear classifier
DSIR_D = 1024  # hashed bag-of-words buckets of the DSIR importance model
DSIR_TARGET_MOD = 29  # doc_id % MOD == 0 -> the "curated target" slice
TOPK_BUCKETS = 64


def global_topk(df: DataFrame, order_cols: list, k: int, rank_name: str = "rnk") -> DataFrame:
    """Scale-safe global top-k rank. Spark's InferWindowGroupLimit only
    rewrites rank-filter windows that HAVE a partition spec (verified
    empirically: the same filter over Window.orderBy gets no
    WindowGroupLimit), so a bare global row_number window funnels the
    entire input through one reducer — the anti-pattern this helper
    exists to avoid.

    Phase 1 ranks inside hash buckets: the bucket window DOES get the
    map-side WindowGroupLimit, so every input partition pre-prunes to k
    rows before the bucket exchange. Phase 2 ranks the <= buckets*k
    survivors globally — the single-partition window sees a bounded row
    count regardless of input size. Caller must pass a TOTAL order
    (tie-broken) for cross-run determinism."""
    from pyspark.sql import Window

    bucket = F.pmod(F.xxhash64(*df.columns), F.lit(TOPK_BUCKETS))
    w_local = Window.partitionBy("_tkb").orderBy(*order_cols)
    w_global = Window.orderBy(*order_cols)
    return (
        df.withColumn("_tkb", bucket)
        .withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .withColumn(rank_name, F.row_number().over(w_global))
        .filter(F.col(rank_name) <= k)
        .drop("_tkb", "_lr")
    )


def tx_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary / Zipf statistics: top-k words by corpus frequency with
    document frequency and cumulative token coverage — the table a
    tokenizer-training run reads first (vocab truncation point, coverage
    curve).

    100-TB shape: the word explode feeds a groupBy with map-side partial
    aggregation (hub words like 'the' collapse to one row per partition
    before the shuffle); the global top-k goes through global_topk's
    two-phase rank, so no reducer ever sees the full vocabulary. The
    corpus token total rides in as a broadcast 1-row aggregate (no
    global window over the vocab). The cumulative-coverage window runs
    over the k ranked rows only."""
    from pyspark.sql import Window

    d = _docs_fanout(spark, sf_dir)
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    vocab = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    total = d.agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tok")
    )
    ranked = global_topk(vocab, [F.desc("cnt"), F.asc("word")], VOCAB_TOPK)
    w_cum = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            F.col("rnk").cast("int").alias("rnk"),
            "word",
            "cnt",
            "n_docs",
            (F.col("cnt").cast("double") / F.col("total_tok")).alias("frac"),
            (F.sum("cnt").over(w_cum).cast("double") / F.col("total_tok")).alias(
                "cum_coverage"
            ),
        )
        .orderBy("rnk")
    )


ORACLE_TX_VOCAB = f"""
WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
v AS (SELECT word, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs FROM w GROUP BY word),
t AS (SELECT count(*) AS total FROM w),
r AS (SELECT word, cnt, n_docs, row_number() OVER (ORDER BY cnt DESC, word) AS rnk, total
      FROM v, t)
SELECT CAST(rnk AS INT) AS rnk, word, CAST(cnt AS BIGINT) AS cnt,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(cnt AS DOUBLE)/total AS frac,
       CAST(sum(cnt) OVER (ORDER BY rnk) AS DOUBLE)/total AS cum_coverage
FROM r WHERE rnk <= {VOCAB_TOPK} ORDER BY rnk
"""


def tx_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-step pair counting: corpus frequency of every adjacent
    character pair, weighted by word frequency — iteration 1 of
    byte-pair-encoding tokenizer training (Sennrich et al. 2016).

    The efficiency trick IS the operator: pairs are enumerated over the
    DISTINCT vocabulary (each word once, weighted by its count), not
    over the corpus — after the wordcount shuffle, the pair stage is
    vocabulary-sized and therefore corpus-size-independent, which is
    what makes repeated BPE iterations feasible at 100 TB. Pair explode
    is array-slot arithmetic in codegen; top-k uses global_topk's
    two-phase rank."""
    d = read_table(spark, "documents", sf_dir)
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wcnt"))
    )
    pairs = (
        vocab.filter(F.length("word") >= 2)
        .select(
            "wcnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.substr(F.col("word"), i, F.lit(2)),
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("wcnt").cast("long").alias("pair_count"))
    )
    ranked = global_topk(pairs, [F.desc("pair_count"), F.asc("pair")], BPE_TOPK)
    return ranked.select(
        F.col("rnk").cast("int").alias("rnk"), "pair", "pair_count"
    ).orderBy("rnk")


ORACLE_TX_BPE = f"""
WITH w AS (SELECT unnest(string_split(text,' ')) AS word FROM documents),
v AS (SELECT word, count(*) AS wcnt FROM w GROUP BY word),
p AS (SELECT unnest(list_transform(range(1, length(word)),
                    i -> substring(word, CAST(i AS INT), 2))) AS pair, wcnt
      FROM v WHERE length(word) >= 2),
g AS (SELECT pair, sum(wcnt) AS pair_count FROM p GROUP BY pair),
r AS (SELECT pair, pair_count,
             row_number() OVER (ORDER BY pair_count DESC, pair) AS rnk FROM g)
SELECT CAST(rnk AS INT) AS rnk, pair, CAST(pair_count AS BIGINT) AS pair_count
FROM r WHERE rnk <= {BPE_TOPK} ORDER BY rnk
"""


def classify(docs: DataFrame) -> DataFrame:
    """Hashed linear quality classifier (fasttext-style): each word maps
    to a feature bucket via the rolling polynomial hash (the
    tx_fingerprint hash mod CLS_DIM), each bucket carries a fixed
    pseudo-random weight in [-1, 1] derived from the multiplicative
    hash, and the document score is the mean bucket weight over its
    words. Stands in for a real fasttext/logreg quality model with the
    weight table swapped in; the plan shape — pure codegen fold, zero
    shuffle, no Python — is the production one.

    Determinism across engines: both Spark's aggregate and DuckDB's
    list_reduce fold left in array order, so the double summation is
    performed in the identical sequence and the scores are
    bit-identical."""
    words = F.split(F.col("text"), " ")

    def word_hash(w):
        return (
            F.aggregate(
                F.split(w, ""),
                F.lit(0).cast("long"),
                lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
            )
            % CLS_DIM
        )

    def weight(b):
        return ((b * SAMPLE_A) % SAMPLE_MOD % 2001 - 1000).cast("double") / 1000.0

    score = F.aggregate(
        words, F.lit(0.0), lambda acc, w: acc + weight(word_hash(w))
    ) / F.size(words)
    return docs.select(
        "doc_id", score.alias("ml_score"), (score > 0).alias("ml_keep")
    )


def bpe_train(vocab: DataFrame, n_merges: int = 30) -> tuple[list, DataFrame]:
    """Full iterative BPE tokenizer training (Sennrich et al. 2016) —
    tx_bpe is round 1's pair count; this runs the actual merge loop.
    `vocab` is (word, wcnt). Each round: (1) count adjacent token pairs
    weighted by word frequency — the stage is VOCABULARY-sized, never
    corpus-sized, because pair statistics over a corpus equal pair
    statistics over its distinct words weighted by count (the same
    observation that makes tx_bpe corpus-size-independent; at 100 TB
    the one corpus-sized job is the initial wordcount, and every one
    of the k training rounds after it touches only the vocabulary);
    (2) pick the max pair with a deterministic (count desc, left,
    right) tie-break — a top-1 TakeOrdered, one driver-side scalar per
    round, job control in the CC idiom, not a data collect; (3) merge
    every non-overlapping occurrence left-to-right map-side via an
    aggregate fold over the token array (merge iff the accumulator's
    last element is `left` and the incoming token is `right` — exactly
    the canonical scan order, pytest-checked against an independent
    pure-Python reimplementation of the paper's algorithm); then
    localCheckpoint to cut lineage so round k never replays rounds
    1..k-1.

    Returns (merges, tokenized_vocab): merges is [(left, right,
    pair_count)] in training order; tokenized_vocab is (word, wcnt,
    toks) after all merges — the trained tokenizer's segmentation of
    the vocabulary."""
    toks = vocab.select(
        "word", "wcnt", F.split(F.col("word"), "").alias("toks")
    ).localCheckpoint(eager=True)
    merges: list = []
    for _ in range(n_merges):
        pairs = (
            toks.filter(F.size("toks") >= 2)
            .select(
                "wcnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("toks") - 2),
                        lambda i: F.struct(
                            F.element_at("toks", i + 1).alias("l"),
                            F.element_at("toks", i + 2).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("wcnt").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top:
            break
        a, b, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
        merges.append((a, b, int(cnt)))
        m = a + b
        toks = toks.withColumn(
            "toks",
            F.aggregate(
                "toks",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(a))
                    & (x == F.lit(b)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(m))
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ),
        ).localCheckpoint(eager=True)
    return merges, toks


def tx_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classify(_docs_fanout(spark, sf_dir))


_WH_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(w,''), c -> CAST(ascii(c) AS BIGINT))), "
    f"(a,x) -> (a*{FP_BASE}+x) % {FP_MOD}) % {CLS_DIM}"
)
ORACLE_TX_CLASSIFY = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS DOUBLE),
           list_transform(string_split(text,' '),
             w -> CAST(({_WH_SQL}) * {SAMPLE_A} % {SAMPLE_MOD} % 2001 - 1000 AS DOUBLE) / 1000.0)),
         (acc, x) -> acc + x) / len(string_split(text,' ')) AS ml_score,
       list_reduce(
         list_prepend(CAST(0 AS DOUBLE),
           list_transform(string_split(text,' '),
             w -> CAST(({_WH_SQL}) * {SAMPLE_A} % {SAMPLE_MOD} % 2001 - 1000 AS DOUBLE) / 1000.0)),
         (acc, x) -> acc + x) / len(string_split(text,' ')) > 0 AS ml_keep
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
    d = _docs_fanout(spark, sf_dir)
    return repetition_stats(d)


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


# Winnowing (Schleimer/Wilkerson/Aiken, the MOSS fingerprint): gram
# size and window. Guarantee: any shared run of WIN_K + WIN_W - 1 words
# between two documents yields at least one shared fingerprint, while
# only ~2/(WIN_W+1) of grams are kept.
WIN_K = 5
WIN_W = 4


def winnow(docs: DataFrame, k: int = WIN_K, w: int = WIN_W) -> DataFrame:
    """Winnowing document fingerprints: hash every word k-gram, slide a
    w-window over the gram-hash sequence, keep each window's MINIMUM
    hash, emit the distinct kept hashes per document with the first
    window index that selected them. This is the robust fingerprint
    behind MOSS-style near-dup/overlap detection — unlike a single
    rolling hash (tx_fingerprint), local edits only perturb the
    fingerprints whose windows they touch.

    Engine-portable determinism: gram hashes are md5 hex strings (the
    decontam convention — Spark and DuckDB produce identical lowercase
    hex, and lexicographic MIN over hex strings is tie-free as a value),
    window mins are pure array arithmetic inside codegen (no explode
    until the final distinct-fingerprint emit, which fans out ~2/(w+1)
    rows per gram), and there is NO shuffle at all — the operator is a
    map-only projection, so at 100 TB it scales with scan bandwidth."""
    ws = F.split(F.col("text"), " ")
    base = docs.select("doc_id", ws.alias("ws")).filter(
        F.size("ws") >= k + w - 1
    )
    ng = F.size("ws") - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), ng),
        lambda i: F.md5(
            F.concat_ws(" ", *[F.element_at(F.col("ws"), i + j) for j in range(k)])
        ),
    )
    g = base.select("doc_id", grams.alias("ghs"))
    wins = F.transform(
        F.sequence(F.lit(1), F.size("ghs") - (w - 1)),
        lambda j: F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.lit(w - 1)),
                lambda d: F.element_at(F.col("ghs"), j + d),
            )
        ),
    )
    v = g.select("doc_id", wins.alias("wins"))
    return v.select(
        "doc_id", "wins", F.explode(F.array_distinct("wins")).alias("fp")
    ).select(
        "doc_id",
        "fp",
        F.array_position("wins", F.col("fp")).cast("int").alias("first_win"),
    )


def tx_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        winnow(_docs_fanout(spark, sf_dir))
    )


ORACLE_TX_WINNOW = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
           WHERE len(string_split(text, ' ')) >= {WIN_K + WIN_W - 1}),
gh AS (SELECT doc_id,
              list_transform(range(1, len(ws) - {WIN_K - 1} + 1), i ->
                md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                    ws[i+3] || ' ' || ws[i+4])) AS ghs
       FROM w),
wins AS (SELECT doc_id,
                list_transform(range(1, len(ghs) - {WIN_W - 1} + 1), j ->
                  list_min(list_slice(ghs, j, j + {WIN_W - 1}))) AS wins
         FROM gh)
SELECT doc_id, fp, CAST(list_position(wins, fp) AS INT) AS first_win
FROM (SELECT doc_id, wins, unnest(list_distinct(wins)) AS fp FROM wins)
ORDER BY doc_id, first_win
"""


def _dsir_bucket(w):
    """Hashed bag-of-words feature: the tx_fingerprint rolling hash of a
    word, folded into one of DSIR_D buckets."""
    return (
        F.aggregate(
            F.split(w, ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
        )
        % DSIR_D
    )


def dsir(docs: DataFrame) -> DataFrame:
    """DSIR-style importance scoring (Data Selection via Importance
    Resampling, Xie et al. 2023): estimate how target-domain-like each
    document is under hashed bag-of-words models of a curated target
    slice vs the raw corpus, so a training-data pipeline can resample
    raw crawl toward the target mixture. The target slice here is the
    deterministic doc_id % DSIR_TARGET_MOD == 0 subset (standing in for
    a curated corpus, the same self-synthesis idiom as decontam's eval
    set); the features are DSIR's hashed n-gram buckets with n=1.

    Engine-portable determinism: DSIR's log-ratio sum is replaced by an
    exactly-computable mass ratio — per-doc integer sums of target /
    raw bucket counts (order-free), then score =
    ((st+1)/(sr+1)) * (tr/tt), three IEEE ops in a fixed order, so
    Spark and DuckDB agree bit-for-bit (ln() is not correctly-rounded
    across engines; division and multiplication are). score > 1 means
    the doc's vocabulary leans toward the target slice relative to the
    corpus-wide base rate; +1 is the usual add-one smoothing.

    100-TB shape — DSIR's own architecture: pass 1 "trains" the model
    (explode -> bucket -> groupBy over DSIR_D keys; map-side combine
    collapses hub words per partition, the shuffle carries at most
    DSIR_D rows per partition) and packs it into ONE row
    (map + two totals) that pass 2 broadcasts; scoring is zero-shuffle
    whole-stage codegen — the corpus text never shuffles, and on a
    cluster the trained model row would be persisted once and reused
    across scoring runs. Words are bucket-hashed ONCE into a
    materialized array column (the tx_repetition lesson: lambda CSE
    across an unmaterialized split is unreliable), then each of the two
    masses is an integer fold with a broadcast-map lookup."""
    is_target = (F.col("doc_id") % DSIR_TARGET_MOD) == 0
    buckets = docs.select(
        is_target.alias("is_target"),
        F.explode(F.transform(F.split("text", " "), _dsir_bucket)).alias("bucket"),
    )
    model = (
        buckets.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_target"), 1).otherwise(0))
            .cast("long")
            .alias("ct"),
            F.count(F.lit(1)).cast("long").alias("cr"),
        )
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.col("bucket"),
                        F.struct(F.col("ct"), F.col("cr")).alias("v"),
                    )
                )
            ).alias("m"),
            F.sum("ct").cast("long").alias("tt"),
            F.sum("cr").cast("long").alias("tr"),
        )
    )
    hashed = docs.select(
        "doc_id", F.transform(F.split("text", " "), _dsir_bucket).alias("hbs")
    )

    def mass(field):
        return F.aggregate(
            F.col("hbs"),
            F.lit(0).cast("long"),
            lambda acc, b: acc
            + F.coalesce(
                F.try_element_at(F.col("m"), b).getField(field),
                F.lit(0).cast("long"),
            ),
        )

    st, sr = mass("ct").alias("target_mass"), mass("cr").alias("raw_mass")
    scored = hashed.crossJoin(F.broadcast(model)).select("doc_id", st, sr, "tt", "tr")
    score = (
        (F.col("target_mass") + 1).cast("double") / (F.col("raw_mass") + 1)
    ) * (F.col("tr").cast("double") / F.col("tt"))
    return scored.select(
        "doc_id",
        "target_mass",
        "raw_mass",
        score.alias("dsir_score"),
        (score >= 1.0).alias("dsir_keep"),
    )


def tx_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir(_docs_fanout(spark, sf_dir))


_WH_DSIR_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(w,''), c -> CAST(ascii(c) AS BIGINT))), "
    f"(a,x) -> (a*{FP_BASE}+x) % {FP_MOD}) % {DSIR_D}"
)
ORACLE_TX_DSIR = f"""
WITH hb AS (SELECT doc_id, doc_id % {DSIR_TARGET_MOD} = 0 AS is_target,
                   list_transform(string_split(text,' '), w -> {_WH_DSIR_SQL}) AS hbs
            FROM documents),
ex AS (SELECT is_target, unnest(hbs) AS bucket FROM hb),
agg AS (SELECT bucket, sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
               count(*) AS cr
        FROM ex GROUP BY bucket),
dense AS (SELECT CAST(r.range AS BIGINT) AS bucket,
                 coalesce(ct, 0) AS ct, coalesce(cr, 0) AS cr
          FROM range(0, {DSIR_D}) r LEFT JOIN agg ON agg.bucket = r.range),
model AS (SELECT list(ct ORDER BY bucket) AS lt, list(cr ORDER BY bucket) AS lr,
                 CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr
          FROM dense),
masses AS (SELECT doc_id,
                  CAST(list_sum(list_transform(hbs, b -> lt[CAST(b AS INT) + 1])) AS BIGINT) AS target_mass,
                  CAST(list_sum(list_transform(hbs, b -> lr[CAST(b AS INT) + 1])) AS BIGINT) AS raw_mass,
                  tt, tr
           FROM hb, model)
SELECT doc_id, target_mass, raw_mass,
       (CAST(target_mass + 1 AS DOUBLE) / (raw_mass + 1))
         * (CAST(tr AS DOUBLE) / tt) AS dsir_score,
       (CAST(target_mass + 1 AS DOUBLE) / (raw_mass + 1))
         * (CAST(tr AS DOUBLE) / tt) >= 1.0 AS dsir_keep
FROM masses ORDER BY doc_id
"""


BM25_QMOD = 97  # doc_id % MOD == 0 -> self-synthesized retrieval queries
BM25_QTERMS = 4  # each query = the doc's first 4 words (bag, not set)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def bm25(docs: DataFrame) -> DataFrame:
    """BM25 retrieval (Robertson/Sparck Jones probabilistic ranking —
    the lexical-retrieval baseline a training-data pipeline uses for
    eval-set decontamination sweeps and RAG-corpus indexing): rank the
    corpus against a deterministic self-synthesized query set (each
    doc_id % BM25_QMOD == 0 contributes its first BM25_QTERMS words as
    a query — the decontam eval-set idiom), emitting top-k
    (query_id, rnk, doc_id, score).

    Engine-portable determinism: the idf's ln() is dropped and the raw
    Robertson ratio (N - df + 0.5)/(df + 0.5) kept (ln is monotone, so
    per-term ranking is order-equivalent; ln() is not correctly-rounded
    across engines while these divisions are — the same substitution
    tx_dsir makes), every float op is written with identical
    parenthesization in both engines, the per-doc score is a
    fixed-order fold over the query's term array, and scores are
    rounded to 9dp BEFORE ranking with a doc_id tiebreak.

    100-TB shape: no corpus-sized shuffle anywhere — the query set, its
    per-term document frequencies and the corpus stats are
    metadata-sized and collected driver-side (a query batch is
    metadata-scale by definition — the same contract as
    sim_topk_bruteforce / pq_topk's LUT build); the corpus pays ONE
    explode pass restricted to the broadcast term list, whose
    per-(doc, term) counts are the only thing that moves; scoring runs
    as one vectorized numpy pass over the per-doc tf vectors
    (mapInPandas), written operand-for-operand in the same order as
    the old per-pair JVM fold — every +,-,*,/ is IEEE-correctly
    rounded in both, so the scores are bit-identical and the unchanged
    final JVM round+window stage (top-k per query, never a global
    window) emits the same rows. Each batch emits only its per-query
    top-k with a 2e-9 margin below the k-th best (x > y + 2e-9 implies
    round(x) > round(y), so no row that could make the rounded global
    top-k is cut batch-side). The old formulation paid |docs| x |Q|
    arrays_overlap evaluations and then 25M interpreted
    higher-order-fold evaluations — 84s at sf1.0 and JIT-warmup
    sensitive (73s on a cold JVM)."""
    words_col = F.split("text", " ")
    d = docs.select(
        "doc_id", words_col.alias("words"), F.size(words_col).alias("dl")
    )
    q = d.filter((F.col("doc_id") % BM25_QMOD) == 0).select(
        F.col("doc_id").alias("query_id"),
        F.slice("words", 1, BM25_QTERMS).alias("terms"),
    )
    qrows = q.orderBy("query_id").collect()
    n_docs, tot_dl = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("tot_dl"),
    ).collect()[0]
    terms_sorted = sorted({t for r in qrows for t in r["terms"]})
    n_terms = len(terms_sorted)
    spark = docs.sparkSession
    # the local fixture is ONE parquet split; hash-repartition so the
    # explode/count pass uses every core (a 100-TB table arrives as
    # thousands of splits and skips this)
    dp = d.repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    terms_df = spark.createDataFrame(
        [(t, i) for i, t in enumerate(terms_sorted)], "t string, tid int"
    )
    # ONE explode pass over the corpus, restricted to query terms by the
    # broadcast join, yields both the per-(doc, term) frequencies and —
    # by counting docs per term — the document frequencies
    tfc = (
        dp.select("doc_id", "dl", F.explode("words").alias("t"))
        .join(F.broadcast(terms_df), "t")
        .groupBy("doc_id", "dl", "tid")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    ).localCheckpoint(eager=False)
    dfs = np.zeros(n_terms + 1, dtype=np.int64)  # slot n_terms = pad (df 0)
    for r in tfc.groupBy("tid").agg(F.count(F.lit(1)).alias("df")).collect():
        dfs[r["tid"]] = r["df"]

    tid_of = {t: i for i, t in enumerate(terms_sorted)}
    n_q = len(qrows)
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    # pad every query to BM25_QTERMS with the phantom term (tf 0, df 0):
    # its contribution is idf * (0 * (k1+1)) / denom = exactly 0.0, and
    # s + 0.0 == s bit-for-bit, so padding never changes a score
    qtid = np.full((n_q, BM25_QTERMS), n_terms, dtype=np.int64)
    for i, r in enumerate(qrows):
        for j, t in enumerate(r["terms"][:BM25_QTERMS]):
            qtid[i, j] = tid_of[t]
    # idf depends only on (N, df): precompute per (query, slot) with the
    # identical operand order as the old JVM fold —
    # (double(N - df) + 0.5) / (double(df) + 0.5)
    qdf = dfs[qtid]  # (Q, T) int64
    idf_mat = ((n_docs - qdf).astype(np.float64) + 0.5) / (
        qdf.astype(np.float64) + 0.5
    )
    avgdl = float(tot_dl) / float(n_docs)
    k1, b, k1p1 = BM25_K1, BM25_B, BM25_K1 + 1.0
    one_minus_b = 1.0 - BM25_B
    top_k = BM25_TOPK

    doc_tf = tfc.groupBy("doc_id", "dl").agg(
        F.collect_list(F.struct("tid", "tf")).alias("tfs")
    )
    scan_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("score_raw", T.DoubleType()),
        ]
    )

    def scan(batches):
        for pdf in batches:
            nb = len(pdf)
            if not nb or not n_q:
                continue
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            dlv = pdf["dl"].to_numpy(dtype=np.float64)
            tfmat = np.zeros((nb, n_terms + 1), dtype=np.float64)
            for i, lst in enumerate(pdf["tfs"]):
                for e in lst:
                    tfmat[i, e["tid"]] = e["tf"]
            # chunk rows so the (chunk, |Q|) temporaries stay small
            for r0 in range(0, nb, 1024):
                Tc = tfmat[r0 : r0 + 1024]
                c = Tc.shape[0]
                denb = k1 * (one_minus_b + b * (dlv[r0 : r0 + 1024] / avgdl))
                s = np.zeros((c, n_q))
                mask = np.zeros((c, n_q), dtype=bool)
                for j in range(BM25_QTERMS):
                    tfj = Tc[:, qtid[:, j]]  # (c, Q)
                    denom = tfj + denb[:, None]
                    s = s + (idf_mat[None, :, j] * (tfj * k1p1)) / denom
                    mask |= tfj > 0.0
                sel = np.where(mask, s, -np.inf)
                t = min(top_k, c)
                kth = np.partition(sel, c - t, axis=0)[c - t, :]
                emit = mask & (sel >= (kth[None, :] - 2e-9))
                ri, qi = np.nonzero(emit)
                yield pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        "doc_id": ids[r0 + ri],
                        "score_raw": s[ri, qi],
                    }
                )

    from pyspark.sql.window import Window

    scored = doc_tf.mapInPandas(scan, scan_schema).select(
        "query_id", "doc_id", F.round("score_raw", 9).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= BM25_TOPK)
        .select("query_id", F.col("rnk").cast("int").alias("rnk"), "doc_id", "score")
        .orderBy("query_id", "rnk")
    )


def tx_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25(read_table(spark, "documents", sf_dir))


ORACLE_TX_BM25 = f"""
WITH d AS (SELECT doc_id, string_split(text,' ') AS words,
                  len(string_split(text,' ')) AS dl FROM documents),
q AS (SELECT doc_id AS query_id, words[1:{BM25_QTERMS}] AS terms
      FROM d WHERE doc_id % {BM25_QMOD} = 0),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(dl) AS BIGINT) AS tot_dl FROM d),
terms AS (SELECT DISTINCT unnest(terms) AS t FROM q),
dfc AS (SELECT t, CAST(count(*) AS BIGINT) AS df
        FROM (SELECT doc_id, unnest(list_distinct(words)) AS t FROM d) x
        JOIN terms USING (t) GROUP BY t),
model AS (SELECT map_from_entries(list(row(t, df))) AS dm FROM dfc),
scored AS (
  SELECT q.query_id, d.doc_id,
         ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(q.terms, t ->
             (((CAST(n_docs - coalesce(map_extract(dm, t)[1], 0) AS DOUBLE) + 0.5)
               / (CAST(coalesce(map_extract(dm, t)[1], 0) AS DOUBLE) + 0.5))
              * (CAST(len(list_filter(d.words, w -> w = t)) AS DOUBLE) * {BM25_K1 + 1.0}))
             / (CAST(len(list_filter(d.words, w -> w = t)) AS DOUBLE)
                + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                   * (CAST(d.dl AS DOUBLE) / (CAST(tot_dl AS DOUBLE) / n_docs)))))),
           (a, x) -> a + x), 9) AS score
  FROM d JOIN q ON list_has_any(d.words, q.terms)
  CROSS JOIN model CROSS JOIN stats
)
SELECT query_id, CAST(rnk AS INT) AS rnk, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scored)
WHERE rnk <= {BM25_TOPK} ORDER BY query_id, rnk
"""


LM_D = 4096  # hashed bigram/context buckets of the quality LM
LM_TARGET_MOD = 31  # doc_id % MOD == 0 -> the "clean reference" slice


def _lm_bucket(s):
    """Rolling-hash bucket of an arbitrary string expression (the
    tx_fingerprint hash folded into LM_D buckets — _dsir_bucket's
    recipe, wider table)."""
    return (
        F.aggregate(
            F.split(s, ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
        )
        % LM_D
    )


def lmscore(docs: DataFrame) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020
    score crawl text with a KenLM trained on Wikipedia and keep the
    low-perplexity head): train a hashed bigram LM on a clean reference
    slice (deterministic doc_id % LM_TARGET_MOD == 0, the decontam/DSIR
    self-synthesis idiom) and score every document by its mean smoothed
    bigram probability P(w2|w1) = (c(w1 w2)+1)/(c(w1)+LM_D) under that
    model. High score = the doc's word transitions look like the
    reference corpus; the keep flag is the CCNet head/tail cut, with
    the cut set scale-freely at the minimum score of the reference
    slice's own documents ("at least as reference-like as the least
    reference-like reference doc") — min is an order-free exact fold,
    unlike a mean, so the threshold is bit-stable across engines and
    partitionings, and it tracks the corpus automatically (absolute
    scores grow ~5x from sf0.001 to sf0.1 as the trained counts
    outgrow the +1 smoothing).

    Engine-portable determinism: perplexity's log/exp is dropped and
    the mean raw probability kept (each probability is one IEEE
    division of exact integer counts — correctly rounded in both
    engines where ln()/exp() are not; the fold order over the doc's
    bigrams is fixed; the mean is one further division, rounded to 9dp
    — the same substitution tx_dsir/tx_bm25 make).

    100-TB shape — identical to DSIR's two-pass architecture: pass 1
    trains on the (small, curated) reference slice only — explode →
    bucket → groupBy over at most LM_D keys each for bigrams and
    contexts, map-side combine collapsing hub transitions — and packs
    the model into ONE row (two maps) that pass 2 broadcasts; scoring
    is zero-shuffle whole-stage codegen and the corpus text never
    moves. Bucket arrays are materialized columns before the fold (the
    tx_repetition CSE lesson)."""
    tgt = docs.filter((F.col("doc_id") % LM_TARGET_MOD) == 0).select(
        F.split("text", " ").alias("ws")
    )
    n1 = F.size("ws") - 1
    bigram_buckets = F.zip_with(
        F.slice("ws", 1, n1),
        F.slice("ws", 2, n1),
        lambda a, b: _lm_bucket(F.concat(a, F.lit(" "), b)),
    )
    ctx_buckets = F.transform(F.slice("ws", 1, n1), _lm_bucket)
    m2 = (
        tgt.select(F.explode(bigram_buckets).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("b", "c"))
            ).alias("m2")
        )
    )
    m1 = (
        tgt.select(F.explode(ctx_buckets).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("b", "c"))
            ).alias("m1")
        )
    )
    model = m2.crossJoin(m1)
    # same lesson as bm25's pinned repartition: broadcast joins keep the
    # probe side's partitioning, and the local fixture is ONE parquet
    # split — without this the interpreted per-bigram bucket fold runs
    # on a single core (measured 6.4s vs ~1s at sf0.1). A 100-TB table
    # arrives as thousands of splits; this stands in for that and costs
    # one shuffle of (doc_id, text)-sized rows.
    hashed = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col("doc_id")
    ).select("doc_id", F.split("text", " ").alias("ws")).select(
        "doc_id", bigram_buckets.alias("b2"), ctx_buckets.alias("b1")
    )
    zero = F.lit(0).cast("long")
    probs = F.zip_with(
        "b2",
        "b1",
        lambda x, y: (
            F.coalesce(F.try_element_at(F.col("m2"), x), zero) + 1
        ).cast("double")
        / (F.coalesce(F.try_element_at(F.col("m1"), y), zero) + LM_D),
    )
    n_big = F.size("b2").cast("long")
    score = F.round(
        F.aggregate(probs, F.lit(0.0), lambda a, x: a + x)
        / n_big.cast("double"),
        9,
    )
    # materialize the scored frame once (r06): the threshold branch
    # (min over the reference slice) and the final select both read it,
    # and without a checkpoint each branch re-ran the full interpreted
    # per-bigram bucket fold over the corpus. Rows are (id, long,
    # double)-sized.
    scored = hashed.crossJoin(F.broadcast(model)).select(
        "doc_id",
        n_big.alias("n_bigrams"),
        score.alias("lm_score"),
    ).localCheckpoint(eager=False)
    thr = (
        scored.filter((F.col("doc_id") % LM_TARGET_MOD) == 0)
        .agg(F.min("lm_score").alias("lm_t"))
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "n_bigrams",
        "lm_score",
        (F.col("lm_score") >= F.col("lm_t")).alias("lm_keep"),
    )


def tx_lmscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lmscore(_docs_fanout(spark, sf_dir))


def _lm_bucket_sql(e: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({e},''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(a,x) -> (a*{FP_BASE}+x) % {FP_MOD}) % {LM_D}"
    )


ORACLE_TX_LMSCORE = f"""
WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
t2 AS (SELECT {_lm_bucket_sql("ws[i] || ' ' || ws[i+1]")} AS b
       FROM w, UNNEST(range(1, len(ws))) AS t(i) WHERE doc_id % {LM_TARGET_MOD} = 0),
t1 AS (SELECT {_lm_bucket_sql("ws[i]")} AS b
       FROM w, UNNEST(range(1, len(ws))) AS t(i) WHERE doc_id % {LM_TARGET_MOD} = 0),
a2 AS (SELECT b, count(*) AS c FROM t2 GROUP BY b),
a1 AS (SELECT b, count(*) AS c FROM t1 GROUP BY b),
d2 AS (SELECT CAST(r.range AS BIGINT) AS b, coalesce(c, 0) AS c
       FROM range(0, {LM_D}) r LEFT JOIN a2 ON a2.b = r.range),
d1 AS (SELECT CAST(r.range AS BIGINT) AS b, coalesce(c, 0) AS c
       FROM range(0, {LM_D}) r LEFT JOIN a1 ON a1.b = r.range),
model AS (SELECT (SELECT list(c ORDER BY b) FROM d2) AS l2,
                 (SELECT list(c ORDER BY b) FROM d1) AS l1),
scored AS (
  SELECT doc_id, CAST(len(ws) - 1 AS BIGINT) AS n_bigrams,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1, len(ws)), i ->
             CAST(l2[CAST({_lm_bucket_sql("ws[i] || ' ' || ws[i+1]")} AS INT) + 1] + 1 AS DOUBLE)
             / (l1[CAST({_lm_bucket_sql("ws[i]")} AS INT) + 1] + {LM_D}))),
           (a, x) -> a + x) / CAST(len(ws) - 1 AS DOUBLE), 9) AS lm_score
  FROM w, model
),
thr AS (SELECT min(lm_score) AS lm_t FROM scored
        WHERE doc_id % {LM_TARGET_MOD} = 0)
SELECT doc_id, n_bigrams, lm_score, lm_score >= lm_t AS lm_keep
FROM scored, thr ORDER BY doc_id
"""


DIV_TTR_MIN = 0.5   # keep: type-token ratio at least this
DIV_TOP_MAX = 0.12  # keep: most-common word at most this fraction


def diversity(docs: DataFrame) -> DataFrame:
    """Lexical-diversity battery (the Gopher/MassiveText repetition-
    adjacent quality signals tx_repetition does NOT cover: vocabulary
    concentration rather than duplication): per doc the type-token
    ratio, the fraction of the most common word, the hapax fraction
    (types occurring once), and the Simpson concentration index
    sum_w (c_w/n)^2 — every value an exact rational of integer counts
    (or a fixed-order fold of IEEE divisions for Simpson), so the
    DuckDB oracle matches bit-for-bit with no log/entropy surrogate
    needed. The keep flag is the Gopher-style cut: enough distinct
    vocabulary AND no single word dominating.

    100-TB shape: zero shuffle — per-doc array arithmetic entirely
    JVM-side; the per-doc type scan is O(types * words) on in-row
    arrays (bounded by doc length, never by corpus size). The words
    and counts arrays are materialized columns before reuse (the
    tx_repetition CSE lesson: an unmaterialized split re-evaluates
    per lambda slot)."""
    d = docs.select("doc_id", F.split("text", " ").alias("ws"))
    d = d.select("doc_id", "ws", F.array_sort(F.array_distinct("ws")).alias("types"))
    d = d.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.size("types").alias("n_types"),
        F.transform(
            "types",
            lambda t: F.size(F.filter(F.col("ws"), lambda w: w == t)),
        ).alias("counts"),
    )
    n = F.col("n_words").cast("double")
    ttr = F.round(F.col("n_types").cast("double") / n, 9)
    top_frac = F.round(F.array_max("counts").cast("double") / n, 9)
    hapax_frac = F.round(
        F.size(F.filter("counts", lambda c: c == 1)).cast("double")
        / F.col("n_types").cast("double"),
        9,
    )
    simpson = F.round(
        F.aggregate(
            "counts",
            F.lit(0.0),
            lambda acc, c: acc + (c.cast("double") / n) * (c.cast("double") / n),
        ),
        9,
    )
    return d.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_types").cast("long").alias("n_types"),
        ttr.alias("ttr"),
        top_frac.alias("top_frac"),
        hapax_frac.alias("hapax_frac"),
        simpson.alias("simpson"),
        ((ttr >= DIV_TTR_MIN) & (top_frac <= DIV_TOP_MAX)).alias("div_keep"),
    )


def tx_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return diversity(_docs_fanout(spark, sf_dir))


ORACLE_TX_DIVERSITY = f"""
WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
t AS (SELECT doc_id, ws, list_sort(list_distinct(ws)) AS types FROM w),
c AS (SELECT doc_id,
             len(ws) AS n_words, len(types) AS n_types,
             list_transform(types, t -> len(list_filter(ws, x -> x = t))) AS counts
      FROM t)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_types AS BIGINT) AS n_types,
       round(CAST(n_types AS DOUBLE) / CAST(n_words AS DOUBLE), 9) AS ttr,
       round(CAST(list_max(counts) AS DOUBLE) / CAST(n_words AS DOUBLE), 9) AS top_frac,
       round(CAST(len(list_filter(counts, x -> x = 1)) AS DOUBLE)
             / CAST(n_types AS DOUBLE), 9) AS hapax_frac,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(counts, x ->
                 (CAST(x AS DOUBLE) / CAST(n_words AS DOUBLE))
                 * (CAST(x AS DOUBLE) / CAST(n_words AS DOUBLE)))),
             (a, v) -> a + v), 9) AS simpson,
       (round(CAST(n_types AS DOUBLE) / CAST(n_words AS DOUBLE), 9) >= {DIV_TTR_MIN}
        AND round(CAST(list_max(counts) AS DOUBLE) / CAST(n_words AS DOUBLE), 9)
            <= {DIV_TOP_MAX}) AS div_keep
FROM c ORDER BY doc_id
"""


C4_LINE_WORDS = 5    # words per synthesized page line
C4_MIN_SENT = 5      # doc keep: at least this many retained sentences
C4_LOREM_MOD = 37    # doc_id % MOD == 0 -> planted 'lorem ipsum' line
C4_BRACE_MOD = 41    # doc_id % MOD == 0 -> planted code-brace line
C4_SHORT_MOD = 7     # doc_id % MOD == 0 -> planted too-short line


def c4_filter(docs: DataFrame) -> DataFrame:
    """The C4 cleaning battery (Raffel et al. 2020: retain lines ending
    in terminal punctuation with >= 3 words; drop any page containing
    'lorem ipsum' or a code brace; drop pages with fewer than
    C4_MIN_SENT retained sentences) over deterministically synthesized
    page lines — the dd_lines/dd_url idiom, so every rule fires at
    every sf and the check can never pass vacuously: the body splits
    into C4_LINE_WORDS-word lines, line i of doc d gets terminal
    punctuation iff (d + i) % 3 != 0, and docs at the planted moduli
    carry a 'lorem ipsum' placeholder line, a '{{'-brace code line, or
    a too-short line. Emits per-doc rule counts, the three rule flags,
    the final keep, and the md5 of the retained text (the residual
    content, not just counts).

    100-TB shape: zero shuffle — synthesis, line filtering, and
    rule evaluation are all in-row array ops, JVM-side."""
    d = docs.select("doc_id", F.split("text", " ").alias("ws"))
    n_chunks = F.ceil(F.size("ws") / F.lit(float(C4_LINE_WORDS))).cast("int")
    body = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat(
            F.array_join(F.slice("ws", i * C4_LINE_WORDS + 1, C4_LINE_WORDS), " "),
            F.when((F.col("doc_id") + i) % 3 != 0, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    empty = F.array().cast("array<string>")
    planted = lambda mod, line: F.when(  # noqa: E731
        F.col("doc_id") % mod == 0, F.array(F.lit(line))
    ).otherwise(empty)
    lines = F.concat(
        body,
        planted(C4_SHORT_MOD, "ok."),
        planted(C4_LOREM_MOD, "lorem ipsum dolor sit amet."),
        planted(C4_BRACE_MOD, "function handler() { return 0 }."),
    )
    d = d.select("doc_id", lines.alias("lines"))
    is_sentence = lambda l: (  # noqa: E731
        (F.substring(l, -1, 1) == ".") & (F.size(F.split(l, " ")) >= 3)
    )
    kept = F.filter("lines", is_sentence)
    has_lorem = F.exists("lines", lambda l: l.contains("lorem ipsum"))
    has_brace = F.exists("lines", lambda l: l.contains("{"))
    n_kept = F.size(kept).cast("long")
    return d.select(
        "doc_id",
        F.size("lines").cast("long").alias("n_lines"),
        n_kept.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (~has_lorem & ~has_brace & (n_kept >= C4_MIN_SENT)).alias("c4_keep"),
        F.md5(F.array_join(kept, "\n")).alias("clean_md5"),
    )


GOPHER_LINE_WORDS = 5   # words per synthesized page line
GOPHER_SYM_MOD = 5      # one planted '#x' word (stays under threshold)
GOPHER_SYMHEAVY_MOD = 19  # ~1/7 of words are '#x' -> symbol ratio fails
GOPHER_DIGIT_MOD = 23   # ~1/4 digit-only words -> alpha fraction fails
GOPHER_BULLET_MOD = 17  # every line bulleted -> bullet fraction fails
GOPHER_ELLIPSIS_MOD = 13  # every line ends '...' -> ellipsis frac fails


def gopher_rules(docs: DataFrame) -> DataFrame:
    """The Gopher/MassiveText repetition-free rule battery (Rae et al.
    2021) that tx_quality/tx_repetition/tx_diversity do not already
    carry: symbol-to-word ratio ('#' words), alphabetic-word fraction,
    bullet-line fraction, ellipsis-line fraction, mean word length and
    word-count bounds — over deterministically decorated words/lines
    (the c4_filter/dd_url idiom): docs at the planted moduli get one
    symbol word (under threshold), a symbol-heavy tail (over), a
    digit-word tail (alpha fraction fails), all-bullet lines, or
    all-ellipsis lines, so every rule fires in BOTH directions at every
    sf and the keep flag can never be vacuous.

    100-TB shape: zero shuffle — decoration, line assembly and every
    rule are in-row array ops, JVM-side codegen; all fractions are one
    IEEE division of exact integer counts (no rounding surrogate), so
    the DuckDB oracle matches bit-for-bit."""
    d = docs.select("doc_id", F.split("text", " ").alias("ws0"))
    n0 = F.size("ws0")
    empty = F.array().cast("array<string>")

    def planted(mod, word, cnt):
        return F.when(
            F.col("doc_id") % mod == 0,
            F.transform(F.sequence(F.lit(1), cnt), lambda i: F.lit(word)),
        ).otherwise(empty)

    ws = F.concat(
        F.col("ws0"),
        planted(GOPHER_SYM_MOD, "#x", F.lit(1)),
        # floor() explicitly on BOTH sides: DuckDB CAST(9.5 AS INT)
        # rounds half-even where Spark's cast truncates
        planted(GOPHER_SYMHEAVY_MOD, "#x", F.floor(n0 / 6).cast("int") + 1),
        planted(GOPHER_DIGIT_MOD, "12345", F.floor(n0 / 3).cast("int") + 1),
    )
    d = d.select("doc_id", ws.alias("ws"))
    n_words = F.size("ws")
    n_sym = F.size(F.filter("ws", lambda w: w.contains("#")))
    n_alpha = F.size(F.filter("ws", lambda w: w.rlike("[A-Za-z]")))
    sum_len = F.aggregate(
        "ws", F.lit(0), lambda acc, w: acc + F.length(w)
    )
    n_chunks = F.ceil(n_words / F.lit(float(GOPHER_LINE_WORDS))).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat(
            F.when(
                (F.col("doc_id") % GOPHER_BULLET_MOD == 0)
                | ((F.col("doc_id") + i) % 4 == 0),
                F.lit("- "),
            ).otherwise(F.lit("")),
            F.array_join(
                F.slice("ws", i * GOPHER_LINE_WORDS + 1, GOPHER_LINE_WORDS), " "
            ),
            F.when(
                (F.col("doc_id") % GOPHER_ELLIPSIS_MOD == 0)
                | ((F.col("doc_id") + i) % 6 == 0),
                F.lit("..."),
            ).otherwise(F.lit(".")),
        ),
    )
    d = d.select(
        "doc_id", n_words.alias("nw"), n_sym.alias("nsym"),
        n_alpha.alias("nalpha"), sum_len.alias("slen"), lines.alias("lines"),
    )
    n_lines = F.size("lines")
    n_bullet = F.size(F.filter("lines", lambda l: l.startswith("- ")))
    n_ellipsis = F.size(F.filter("lines", lambda l: l.endswith("...")))
    sym_ratio = F.col("nsym").cast("double") / F.col("nw")
    alpha_frac = F.col("nalpha").cast("double") / F.col("nw")
    bullet_frac = n_bullet.cast("double") / n_lines
    ellipsis_frac = n_ellipsis.cast("double") / n_lines
    mean_wl = F.col("slen").cast("double") / F.col("nw")
    keep = (
        (sym_ratio <= 0.1)
        & (alpha_frac >= 0.8)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (F.col("nw") >= 50)
        & (F.col("nw") <= 100000)
        & (mean_wl >= 2.0)
        & (mean_wl <= 12.0)
    )
    return d.select(
        "doc_id",
        F.col("nw").cast("long").alias("n_words"),
        sym_ratio.alias("sym_ratio"),
        alpha_frac.alias("alpha_frac"),
        n_lines.cast("long").alias("n_lines"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        mean_wl.alias("mean_wl"),
        keep.alias("gopher_keep"),
    )


def tx_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_rules(_docs_fanout(spark, sf_dir))


ORACLE_TX_GOPHER = f"""
WITH w0 AS (SELECT doc_id, string_split(text,' ') AS ws0 FROM documents),
w AS (
  SELECT doc_id,
         ws0
         || CASE WHEN doc_id % {GOPHER_SYM_MOD} = 0 THEN ['#x'] ELSE [] END
         || CASE WHEN doc_id % {GOPHER_SYMHEAVY_MOD} = 0
                 THEN list_transform(range(CAST(floor(len(ws0)/6) AS INT) + 1), i -> '#x')
                 ELSE [] END
         || CASE WHEN doc_id % {GOPHER_DIGIT_MOD} = 0
                 THEN list_transform(range(CAST(floor(len(ws0)/3) AS INT) + 1), i -> '12345')
                 ELSE [] END AS ws
  FROM w0
),
m AS (
  SELECT doc_id, ws,
         len(ws) AS nw,
         len(list_filter(ws, x -> contains(x, '#'))) AS nsym,
         len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS nalpha,
         list_sum(list_transform(ws, x -> length(x))) AS slen,
         list_transform(range(CAST(ceil(len(ws)/{GOPHER_LINE_WORDS}.0) AS BIGINT)),
           i -> (CASE WHEN doc_id % {GOPHER_BULLET_MOD} = 0
                      OR (doc_id + i) % 4 = 0 THEN '- ' ELSE '' END)
                || array_to_string(ws[i*{GOPHER_LINE_WORDS}+1 : i*{GOPHER_LINE_WORDS}+{GOPHER_LINE_WORDS}], ' ')
                || (CASE WHEN doc_id % {GOPHER_ELLIPSIS_MOD} = 0
                         OR (doc_id + i) % 6 = 0 THEN '...' ELSE '.' END)
         ) AS lines
  FROM w
),
r AS (
  SELECT doc_id, nw, nsym, nalpha, slen,
         len(lines) AS nl,
         len(list_filter(lines, l -> left(l, 2) = '- ')) AS nb,
         len(list_filter(lines, l -> right(l, 3) = '...')) AS ne
  FROM m
)
SELECT doc_id,
       CAST(nw AS BIGINT) AS n_words,
       CAST(nsym AS DOUBLE) / nw AS sym_ratio,
       CAST(nalpha AS DOUBLE) / nw AS alpha_frac,
       CAST(nl AS BIGINT) AS n_lines,
       CAST(nb AS DOUBLE) / nl AS bullet_frac,
       CAST(ne AS DOUBLE) / nl AS ellipsis_frac,
       CAST(slen AS DOUBLE) / nw AS mean_wl,
       (CAST(nsym AS DOUBLE) / nw <= 0.1
        AND CAST(nalpha AS DOUBLE) / nw >= 0.8
        AND CAST(nb AS DOUBLE) / nl <= 0.9
        AND CAST(ne AS DOUBLE) / nl <= 0.3
        AND nw BETWEEN 50 AND 100000
        AND CAST(slen AS DOUBLE) / nw BETWEEN 2.0 AND 12.0) AS gopher_keep
FROM r ORDER BY doc_id
"""


def tx_c4filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return c4_filter(_docs_fanout(spark, sf_dir))


ORACLE_TX_C4FILTER = f"""
WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
ls AS (
  SELECT doc_id,
         list_transform(range(CAST(ceil(len(ws)/{C4_LINE_WORDS}.0) AS BIGINT)),
           i -> array_to_string(ws[i*{C4_LINE_WORDS}+1 : i*{C4_LINE_WORDS}+{C4_LINE_WORDS}], ' ')
                || CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END)
         || CASE WHEN doc_id % {C4_SHORT_MOD} = 0 THEN ['ok.'] ELSE [] END
         || CASE WHEN doc_id % {C4_LOREM_MOD} = 0
                 THEN ['lorem ipsum dolor sit amet.'] ELSE [] END
         || CASE WHEN doc_id % {C4_BRACE_MOD} = 0
                 THEN ['function handler() {{ return 0 }}.'] ELSE [] END AS lines
  FROM w
),
r AS (
  SELECT doc_id, lines,
         list_filter(lines, l -> right(l, 1) = '.'
                     AND len(string_split(l, ' ')) >= 3) AS kept,
         len(list_filter(lines, l -> contains(l, 'lorem ipsum'))) > 0 AS has_lorem,
         len(list_filter(lines, l -> contains(l, '{{'))) > 0 AS has_brace
  FROM ls
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_sentences,
       has_lorem, has_brace,
       (NOT has_lorem AND NOT has_brace
        AND len(kept) >= {C4_MIN_SENT}) AS c4_keep,
       md5(array_to_string(kept, chr(10))) AS clean_md5
FROM r ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# tx_mainext — within-page main-content extraction (jusText/trafilatura-lite)
# ---------------------------------------------------------------------------

MAINEXT_MIN_CHARS = 25  # a block below this is navigation/footer chrome
# keep iff link_chars / text_chars <= 1/3 — compared as 3*lnk <= txt so
# the cut is exact integer arithmetic in both engines


def main_content_blocks(pages: DataFrame, html_col: str = "html_str",
                        id_col: str = "doc_id") -> DataFrame:
    """Block-level main-content extraction: split the page into
    newline-delimited markup blocks, score each block by tag-stripped
    text length and anchor-text share (jusText/trafilatura's
    link-density heuristic), keep long low-link-density blocks, and
    emit the concatenated main text's length + md5 with block counts.

    dd_lines removes boilerplate ACROSS documents (lines repeated
    corpus-wide); this is the WITHIN-page structural pass that runs
    before it — navigation, sidebars and footers never reach the
    corpus stage. Everything is in-row codegen (split / transform /
    filter / aggregate over the block array): zero shuffle, so at
    10^12 pages the op is embarrassingly parallel inside the page
    scan."""
    html = F.col(html_col)
    blocks = F.split(html, "\n")
    stats = F.transform(
        blocks,
        lambda b: F.struct(
            F.trim(F.regexp_replace(b, "<[^>]*>", "")).alias("txt"),
            F.aggregate(
                F.regexp_extract_all(b, F.lit("<a [^>]*>([^<]*)</a>"), F.lit(1)),
                F.lit(0),
                lambda acc, x: acc + F.length(x),
            ).alias("lnk"),
        ),
    )
    kept = F.filter(
        stats,
        lambda s: (F.length(s.getField("txt")) >= MAINEXT_MIN_CHARS)
        & (s.getField("lnk") * 3 <= F.length(s.getField("txt"))),
    )
    main = F.array_join(F.transform(kept, lambda s: s.getField("txt")), "\n")
    return pages.select(
        F.col(id_col).alias("doc_id"),
        F.size(blocks).alias("n_blocks"),
        F.size(kept).alias("n_kept"),
        F.length(main).alias("main_chars"),
        F.md5(main).alias("main_md5"),
    )


def pages_with_block_markup(d: DataFrame) -> DataFrame:
    """docs -> (doc_id, html_str) with newline-delimited blocks: a pure-
    link nav, the first half of the text as a content paragraph, a
    pure-link sidebar on 2 of 3 pages, the second half with one inline
    link, and a short linky footer — so kept and dropped blocks both
    exist on every page and the halves' length variance exercises the
    MIN_CHARS cut."""
    did = F.col("doc_id")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    h = F.floor(n / 2).cast("int")
    first = F.array_join(F.slice(words, 1, h), " ")
    second = F.array_join(F.slice(words, h + 1, n - h), " ")
    nav = F.lit('<nav><a href="/">home</a> <a href="/about">about</a></nav>')
    b1 = F.concat(F.lit("<p>"), first, F.lit("</p>"))
    sidebar = F.when(
        did % 3 != 2,
        F.lit('<div><a href="/t/1">trending now</a> '
              '<a href="/t/2">top stories</a></div>\n'),
    ).otherwise(F.lit(""))
    b3 = F.concat(
        F.lit("<p>"), second, F.lit(' see <a href="/doc/'),
        (did + 1).cast("string"), F.lit('">related article</a></p>'),
    )
    footer = F.lit('<footer>c 2023 terms <a href="/tos">tos</a></footer>')
    html = F.concat(
        nav, F.lit("\n"), b1, F.lit("\n"), sidebar, b3, F.lit("\n"), footer
    )
    return d.select(did.alias("doc_id"), html.alias("html_str"))


def tx_mainext(spark: SparkSession, sf_dir: str) -> DataFrame:
    return main_content_blocks(
        pages_with_block_markup(_docs_fanout(spark, sf_dir))
    )


ORACLE_TX_MAINEXT = f"""
WITH halves AS (
  SELECT doc_id,
         array_to_string(ws[1 : h], ' ') AS first,
         array_to_string(ws[h + 1 : n], ' ') AS second
  FROM (
    SELECT doc_id, ws, len(ws) AS n,
           CAST(floor(len(ws) / 2) AS INT) AS h
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
  )
),
pages AS (
  SELECT doc_id,
         '<nav><a href="/">home</a> <a href="/about">about</a></nav>'
         || chr(10) || '<p>' || first || '</p>' || chr(10)
         || CASE WHEN doc_id % 3 <> 2 THEN
              '<div><a href="/t/1">trending now</a> '
              || '<a href="/t/2">top stories</a></div>' || chr(10)
            ELSE '' END
         || '<p>' || second || ' see <a href="/doc/'
         || CAST(doc_id + 1 AS VARCHAR) || '">related article</a></p>'
         || chr(10)
         || '<footer>c 2023 terms <a href="/tos">tos</a></footer>' AS html_str
  FROM halves
),
scored AS (
  SELECT doc_id, stats,
         list_filter(stats, s -> length(s.txt) >= {MAINEXT_MIN_CHARS}
                     AND 3 * s.lnk <= length(s.txt)) AS kept
  FROM (
    SELECT doc_id,
           list_transform(string_split(html_str, chr(10)), b -> struct_pack(
             txt := trim(regexp_replace(b, '<[^>]*>', '', 'g')),
             lnk := COALESCE(list_sum(list_transform(
               regexp_extract_all(b, '<a [^>]*>([^<]*)</a>', 1),
               x -> length(x))), 0)
           )) AS stats
    FROM pages
  )
)
SELECT doc_id,
       CAST(len(stats) AS INT) AS n_blocks,
       CAST(len(kept) AS INT) AS n_kept,
       CAST(length(main) AS INT) AS main_chars,
       md5(main) AS main_md5
FROM (
  -- empty kept list: array_to_string gives NULL, Spark's array_join ''
  SELECT doc_id, stats, kept,
         COALESCE(array_to_string(list_transform(kept, s -> s.txt),
                                  chr(10)), '') AS main
  FROM scored
) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# tx_colloc — PMI/lift collocation mining (phrase discovery)
# ---------------------------------------------------------------------------

COLLOC_MIN_COUNT = 5    # prune singleton bigrams before scoring
COLLOC_LIFT_T = 5.0     # a bigram this far above independence is a phrase


def collocations(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram lift scoring for phrase mining — the alias-expansion
    feeder for the concept dictionary (multi-word surfaces like
    'data pipeline' must be DISCOVERED before a linker can carry
    them). score = n_xy * N / (n_left(x) * n_right(y)), i.e. observed
    over expected under positional independence: every operand is an
    exact int64 count, so the single IEEE division is bit-identical in
    any engine and no log/PMI surrogate is needed (lift = exp(PMI)).

    Scale: bigrams roll up map-side to vocabulary^2-bounded keys; the
    positional marginals derive from that rollup (not the corpus) and
    come back as broadcasts, and the grand total rides a lazy one-row
    crossJoin — the corpus itself is touched once."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    bg = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(words, 1, n - 1).alias("w1"),
                F.slice(words, 2, n - 1).alias("w2"),
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_xy"))
    left = counts.groupBy("w1").agg(F.sum("n_xy").alias("n_left"))
    right = counts.groupBy("w2").agg(F.sum("n_xy").alias("n_right"))
    total = counts.agg(F.sum("n_xy").alias("_n_total"))
    scored = (
        counts.filter(F.col("n_xy") >= COLLOC_MIN_COUNT)
        .join(F.broadcast(left), "w1")
        .join(F.broadcast(right), "w2")
        .crossJoin(F.broadcast(total))
    )
    # factors go to double BEFORE multiplying: exact while products are
    # < 2^53 (every tested sf), and at 10^12-doc scale — where
    # n_xy * n_total can pass 2^63 — it degrades to IEEE rounding
    # instead of the long*long product failing (ANSI-on default in
    # Spark 4.x throws ARITHMETIC_OVERFLOW; ANSI off would wrap
    # silently). Oracle mirrors the same evaluation order.
    lift = (F.col("n_xy").cast("double") * F.col("_n_total")) / (
        F.col("n_left").cast("double") * F.col("n_right")
    )
    return scored.select(
        "w1", "w2", "n_xy", "n_left", "n_right",
        lift.alias("lift"),
        F.when(lift >= COLLOC_LIFT_T, F.lit("phrase"))
        .otherwise(F.lit("chance"))
        .alias("verdict"),
    )


def tx_colloc_from(d: DataFrame) -> DataFrame:
    """Frame-level tx_colloc (docs(doc_id, text) -> scored bigrams) so
    the N-vs-4N scaling gauntlet can drive it over its synthesized
    corpus."""
    did = F.col("doc_id")
    text2 = (
        F.when(did % 4 == 0, F.concat(F.col("text"), F.lit(" data pipeline")))
        .when(did % 4 == 1, F.concat(F.col("text"), F.lit(" vector index")))
        .otherwise(F.col("text"))
    )
    return collocations(d.select(text2.alias("text")))


def tx_colloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining over the corpus with planted phrases: every
    doc_id%4==0 doc ends with ' data pipeline' and every %4==1 with
    ' vector index' — 'pipeline' and 'index' are out-of-vocabulary, so
    two genuine collocations exist against the word-salad background
    and the phrase/chance verdict is never vacuous."""
    return tx_colloc_from(_docs_fanout(spark, sf_dir))


ORACLE_TX_COLLOC = f"""
WITH docs2 AS (
  SELECT CASE WHEN doc_id % 4 = 0 THEN text || ' data pipeline'
              WHEN doc_id % 4 = 1 THEN text || ' vector index'
              ELSE text END AS text
  FROM documents
),
bg AS (
  SELECT UNNEST(ws[1 : n - 1]) AS w1, UNNEST(ws[2 : n]) AS w2
  FROM (SELECT string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS n
        FROM docs2)
),
counts AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_xy FROM bg GROUP BY w1, w2
),
lefts AS (SELECT w1, SUM(n_xy) AS n_left FROM counts GROUP BY w1),
rights AS (SELECT w2, SUM(n_xy) AS n_right FROM counts GROUP BY w2),
total AS (SELECT SUM(n_xy) AS n_total FROM counts)
SELECT c.w1, c.w2, c.n_xy,
       CAST(l.n_left AS BIGINT) AS n_left,
       CAST(r.n_right AS BIGINT) AS n_right,
       (CAST(c.n_xy AS DOUBLE) * t.n_total)
         / (CAST(l.n_left AS DOUBLE) * r.n_right) AS lift,
       CASE WHEN (CAST(c.n_xy AS DOUBLE) * t.n_total)
                   / (CAST(l.n_left AS DOUBLE) * r.n_right)
                 >= {COLLOC_LIFT_T} THEN 'phrase'
            ELSE 'chance' END AS verdict
FROM counts c
JOIN lefts l USING (w1) JOIN rights r USING (w2) CROSS JOIN total t
WHERE c.n_xy >= {COLLOC_MIN_COUNT}
ORDER BY c.w1, c.w2
"""


# ---------------------------------------------------------------------------
# tx_postings — inverted-index construction
# ---------------------------------------------------------------------------

POSTINGS_TOPK = 5  # postings list cap per term (tf-ordered head)


def inverted_index(docs: DataFrame, text_col: str = "text",
                   k: int = POSTINGS_TOPK) -> DataFrame:
    """Build the inverted index BM25 scoring presumes: per term, the
    document frequency, collection frequency, and a tf-ordered capped
    postings head serialized as 'doc:tf,doc:tf,...' (ties broken by
    doc_id so the string is deterministic).

    100-TB shape: (term, doc) tf partials aggregate map-side; the
    per-term top-k goes through a rank window that Spark plans with a
    map-side WindowGroupLimit (plan-tested), so each partition prunes
    to k rows per term BEFORE the exchange and no reducer ever holds a
    hub term's full postings; the collect_list after the filter is
    bounded by k."""
    from pyspark.sql import Window

    tf = (
        docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    top = tf.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    entry = F.concat(
        F.col("doc_id").cast("string"), F.lit(":"), F.col("tf").cast("string")
    )
    postings = top.groupBy("term").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rn"), entry.alias("s")))
                ),
                lambda x: x.getField("s"),
            ),
        ).alias("postings")
    )
    return stats.join(postings, "term")


def tx_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return inverted_index(
        _docs_fanout(spark, sf_dir)
    ).orderBy("term")


ORACLE_TX_POSTINGS = f"""
WITH tf AS (
  SELECT term, doc_id, COUNT(*) AS tf FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
  ) GROUP BY term, doc_id
),
stats AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
  FROM tf GROUP BY term
),
top AS (
  SELECT term, doc_id, tf,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
  FROM tf
),
p AS (
  SELECT term,
         string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                    ',' ORDER BY rn) AS postings
  FROM top WHERE rn <= {POSTINGS_TOPK} GROUP BY term
)
SELECT s.term, s.df, s.cf, p.postings
FROM stats s JOIN p USING (term) ORDER BY s.term
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
    "tx_gopher": (
        None, ["doc_id"],
        [("n_words", "n"), ("sym_ratio", "n"), ("alpha_frac", "n"),
         ("n_lines", "n"), ("bullet_frac", "n"), ("ellipsis_frac", "n"),
         ("mean_wl", "n"), ("gopher_keep", "s")],
    ),
    "tx_fingerprint": (None, ["doc_id"], [("fingerprint", "n")]),
    "tx_repetition": (
        None, ["doc_id"],
        [("n_words", "n"), ("n_distinct_words", "n"), ("dup_word_frac", "n"),
         ("dup_2gram_frac", "n"), ("dup_3gram_frac", "n")],
    ),
    "tx_decontam": (
        None, ["doc_id"],
        [("n_contam_grams", "n"), ("contaminated", "s")],
    ),
    "tx_sample": (
        None, ["doc_id"],
        [("source", "s"), ("bucket", "n"), ("rate_permille", "n"),
         ("sampled", "s")],
    ),
    "tx_mix": (
        None, ["source"],
        [("n_docs", "n"), ("n_sampled", "n"), ("achieved_permille", "n"),
         ("tok_sampled", "n")],
    ),
    "tx_pack": (
        None, ["doc_id"],
        [("shard", "n"), ("n_tok", "n"), ("start_off", "n"), ("seq_id", "n")],
    ),
    "tx_redact": (
        None, ["doc_id"],
        [("n_emails", "n"), ("n_ips", "n"), ("redacted_md5", "s")],
    ),
    "tx_funnel": (
        None, ["stage"],
        [("n_first_fail", "n"), ("n_remaining_after", "n")],
    ),
    "tx_vocab": (
        None, ["rnk"],
        [("word", "s"), ("cnt", "n"), ("n_docs", "n"), ("frac", "n"),
         ("cum_coverage", "n")],
    ),
    "tx_bpe": (None, ["rnk"], [("pair", "s"), ("pair_count", "n")]),
    "tx_classify": (None, ["doc_id"], [("ml_score", "n"), ("ml_keep", "s")]),
    "tx_winnow": (None, ["doc_id", "fp"], [("first_win", "n")]),
    "tx_dsir": (
        None, ["doc_id"],
        [("target_mass", "n"), ("raw_mass", "n"), ("dsir_score", "n"),
         ("dsir_keep", "s")],
    ),
    "tx_bm25": (
        None, ["query_id", "rnk"], [("doc_id", "n"), ("score", "n")]
    ),
    "tx_lmscore": (
        None, ["doc_id"],
        [("n_bigrams", "n"), ("lm_score", "n"), ("lm_keep", "s")],
    ),
    "tx_diversity": (
        None, ["doc_id"],
        [("n_words", "n"), ("n_types", "n"), ("ttr", "n"), ("top_frac", "n"),
         ("hapax_frac", "n"), ("simpson", "n"), ("div_keep", "s")],
    ),
    "tx_c4filter": (
        None, ["doc_id"],
        [("n_lines", "n"), ("n_sentences", "n"), ("has_lorem", "s"),
         ("has_brace", "s"), ("c4_keep", "s"), ("clean_md5", "s")],
    ),
    "tx_mainext": (
        None, ["doc_id"],
        [("n_blocks", "n"), ("n_kept", "n"), ("main_chars", "n"),
         ("main_md5", "s")],
    ),
    "tx_colloc": (
        None, ["w1", "w2"],
        [("n_xy", "n"), ("n_left", "n"), ("n_right", "n"), ("lift", "n"),
         ("verdict", "s")],
    ),
    "tx_postings": (
        None, ["term"],
        [("df", "n"), ("cf", "n"), ("postings", "s")],
    ),
}


def tx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound text-analysis bundle: language-ID, quality battery,
    token counts, rolling-hash fingerprint, repetition signals,
    benchmark decontamination, stratified sampling, and the training-mix
    report — the standalone tx_* queries melted into one oracle-checked
    frame."""
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
    "tx_decontam": tx_decontam,
    "tx_sample": tx_sample,
    "tx_mix": tx_mix,
    "tx_pack": tx_pack,
    "tx_redact": tx_redact,
    "tx_funnel": tx_funnel,
    "tx_vocab": tx_vocab,
    "tx_bpe": tx_bpe,
    "tx_classify": tx_classify,
    "tx_winnow": tx_winnow,
    "tx_dsir": tx_dsir,
    "tx_bm25": tx_bm25,
    "tx_lmscore": tx_lmscore,
    "tx_diversity": tx_diversity,
    "tx_c4filter": tx_c4filter,
    "tx_gopher": tx_gopher,
    "tx_mainext": tx_mainext,
    "tx_colloc": tx_colloc,
    "tx_postings": tx_postings,
}

ORACLES = {
    "tx_langid": ORACLE_TX_LANGID,
    "tx_quality": ORACLE_TX_QUALITY,
    "tx_tokens": ORACLE_TX_TOKENS,
    "tx_fingerprint": ORACLE_TX_FINGERPRINT,
    "tx_repetition": ORACLE_TX_REPETITION,
    "tx_decontam": ORACLE_TX_DECONTAM,
    "tx_sample": ORACLE_TX_SAMPLE,
    "tx_mix": ORACLE_TX_MIX,
    "tx_pack": ORACLE_TX_PACK,
    "tx_redact": ORACLE_TX_REDACT,
    "tx_funnel": ORACLE_TX_FUNNEL,
    "tx_vocab": ORACLE_TX_VOCAB,
    "tx_bpe": ORACLE_TX_BPE,
    "tx_classify": ORACLE_TX_CLASSIFY,
    "tx_winnow": ORACLE_TX_WINNOW,
    "tx_dsir": ORACLE_TX_DSIR,
    "tx_bm25": ORACLE_TX_BM25,
    "tx_lmscore": ORACLE_TX_LMSCORE,
    "tx_diversity": ORACLE_TX_DIVERSITY,
    "tx_c4filter": ORACLE_TX_C4FILTER,
    "tx_gopher": ORACLE_TX_GOPHER,
    "tx_mainext": ORACLE_TX_MAINEXT,
    "tx_colloc": ORACLE_TX_COLLOC,
    "tx_postings": ORACLE_TX_POSTINGS,
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
