"""Deduplication operators — the training-data-pipeline family.

The corpus-scale posture for each:
- exact: hash-groupBy on a 64-bit content hash (never shuffle full
  text); at 10^12 docs this is one shuffle of (hash, url) pairs.
- minhash-lsh: signatures in one Arrow pass, banding turns all-pairs
  into equi-joins, hub blocks capped+counted (kgforge.canon).
- simhash: 64-bit signature via per-token hash bit-voting in one Arrow
  pass (numpy, no shuffle); candidates by 16-bit band equality,
  verified by hamming distance JVM-side.
- ngram-jaccard: exact verification path, explode->equi-join->count.

Driver-checkable variants run at sf0.01 (500 docs); the same code paths
are exercised at bench scale by bench.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from kgforge.sources import read_table
from kgforge import canon as C
from kgforge.conf import LSH_BANDS, MAX_LSH_BLOCK, MINHASH_PERMS

SHINGLE_K = 3
JACCARD_T = 0.8


def _docs_with_clones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + deterministic exact clones (doc_id%10==0 re-keyed at
    +100000) so the exact-dedup operator has real duplicate groups."""
    d = read_table(spark, "documents", sf_dir).select("doc_id", "text")
    clones = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return d.unionByName(clones)


def dd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep min id, count copies.
    Output one row per duplicate GROUP (n_copies > 1). The md5 is the
    group key evidence; at corpus scale the same plan groups by
    xxhash64(text) and never shuffles text bodies."""
    docs = _docs_with_clones(spark, sf_dir)
    return (
        docs.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


ORACLE_DD_EXACT = """
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
)
SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM docs GROUP BY md5(text) HAVING COUNT(*) > 1
ORDER BY keeper_doc_id
"""


def _shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """Distinct word-k-shingles per doc — shared by the jaccard ops.

    The split materializes as a column BEFORE the transform: F.slice
    referencing an outer unmaterialized split(text) inside the lambda
    is not subexpression-eliminated, so it would re-split the document
    once per shingle slot (the O(words²) defect benching caught in
    tx_repetition)."""
    words = F.col("ws")
    sh = F.when(
        F.size(words) <= k, F.array(F.concat_ws(" ", words))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - k - 1 + 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        )
    )
    return docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    ).select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def dd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: explode distinct shingles,
    self-equi-join on shingle (the blocking key), count intersections,
    filter J >= 0.8. This is the exact baseline the approximate methods
    (minhash/simhash) are measured against."""
    docs = read_table(spark, "documents", sf_dir).select("doc_id", "text")
    sh = _shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "n_a"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "n_b"), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 9
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_T)
        .select("a", "b", "jaccard")
    )


ORACLE_DD_NGRAM_JACCARD = """
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(string_split(text,' ')) <= 3
         THEN [array_to_string(string_split(text,' '), ' ')]
         ELSE list_transform(range(0, len(string_split(text,' ')) - 2),
                i -> array_to_string((string_split(text,' '))[i+1:i+3], ' '))
    END)) AS shingle
  FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_inter
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT a, b,
       ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 9) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 9) >= 0.8
ORDER BY a, b
"""


def dd_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection: signatures (Arrow UDF) -> banded
    blocks -> candidate pairs -> EXACT Jaccard verification. Verified
    output equals the exact baseline because miss probability per true
    pair at J>=0.8 is (1-0.8^4)^32 ~ 5e-8 with 128 perms / 32 bands —
    at 10^12 docs the same plan never materializes all-pairs, only the
    banded candidates."""
    docs = (
        read_table(spark, "documents", sf_dir)
        .select(F.col("doc_id").alias("url"), "text")
    )
    # canonicalize's signature discipline (r06): checkpoint the sigs so
    # the block table's two consumers (the size aggregation and the
    # restricted self-join) never re-run the minhash UDF, and spread
    # the one-split local fixture across cores first (a 100-TB table
    # arrives as thousands of splits and skips the repartition)
    dp = docs.repartition(spark.sparkContext.defaultParallelism, "url")
    sigs = C.minhash_signatures(dp, "text", "url", n_perms=MINHASH_PERMS).localCheckpoint(
        eager=True
    )
    blocks = C.lsh_blocks(sigs, n_bands=LSH_BANDS, id_col="url")
    pairs, _metrics = C.candidate_pairs(blocks, id_col="url", max_block=MAX_LSH_BLOCK)
    pairs = pairs.localCheckpoint(eager=True)
    verified = C.verify_pairs_jaccard(pairs, docs, JACCARD_T, "url", "text")
    return (
        verified.select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.round("jaccard", 9).alias("jaccard"),
        )
    )


# identical expected output to the exact baseline
ORACLE_DD_MINHASH_LSH = ORACLE_DD_NGRAM_JACCARD


def make_simhash_udf():
    """Vectorized 64-bit Charikar simhash: one Arrow batch pass per
    partition, numpy bit-voting inside (same batch discipline as
    canon.make_minhash_udf). Token hash = crc32 avalanched to 64 bits
    with the splitmix64 finalizer — deterministic across processes
    (cross-parallelism parity) unlike builtin hash().

    This replaced a JVM formulation (explode -> groupBy(doc, tok) ->
    64 conditional SUMs -> 64-term bit-assembly expression): correct
    and codegen'd, but it paid TWO hash aggregations over the token
    stream plus a multi-second one-time codegen compile of the 64-wide
    aggregate — measured 11s at sf0.01 / 19s at sf0.1 vs ~2s/4s for
    this zero-shuffle map (signature work rides the scan, no exchange
    at any corpus size)."""
    from collections import Counter
    from zlib import crc32

    M1 = np.uint64(0x9E3779B97F4A7C15)
    M2 = np.uint64(0xBF58476D1CE4E5B9)
    POW2 = np.uint64(1) << np.arange(64, dtype=np.uint64)

    @pandas_udf(T.LongType())
    def simhash64(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        with np.errstate(over="ignore"):
            for i, t in enumerate(text):
                if not t:
                    continue
                tf = Counter(t.split())
                h = np.fromiter(
                    (crc32(k.encode("utf-8")) for k in tf),
                    dtype=np.uint64,
                    count=len(tf),
                )
                h = (h + np.uint64(1)) * M1
                h ^= h >> np.uint64(29)
                h *= M2
                h ^= h >> np.uint64(32)
                # (T, 64) bit matrix; x86 little-endian byte view
                bits = np.unpackbits(
                    h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
                ).astype(np.int64)
                w = np.fromiter(tf.values(), dtype=np.int64, count=len(tf))
                votes = w @ (2 * bits - 1)
                out[i] = np.bitwise_or.reduce(POW2[votes > 0]).astype(np.int64) if (votes > 0).any() else 0
        return pd.Series(out)

    return simhash64


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """64-bit simhash per doc via the Arrow UDF above — a pure map over
    the scan (no shuffle). Returns (doc_id, simhash)."""
    udf = make_simhash_udf()
    return docs.select("doc_id", udf(F.col("text")).alias("simhash"))


def simhash_pairs(
    docs: DataFrame, hamming_max: int = 12, max_chunk: int = MAX_LSH_BLOCK
) -> tuple[DataFrame, DataFrame]:
    """SimHash near-dup candidates, hub chunks capped AND counted.
    Returns (pairs(a, b, hamming), metrics).

    Blocking is 4x16-bit chunk equality: near-dups (hamming <= 12 over
    64 bits) agree on >= 1 chunk by pigeonhole when the flips spread, and
    w.h.p. otherwise. A 16-bit chunk value collects ~N/65536 docs at
    corpus scale — the band self-join over such a hub block is
    quadratic, so chunks bigger than max_chunk are DROPPED and COUNTED
    (same no-silent-caps discipline as canon.candidate_pairs,
    SURVEY.md §7.5). The keep-key set is bounded by construction
    (<= 4 * 65536 rows), so the restriction join broadcasts.

    The signature frame is materialized ONCE (r06): the plan below
    reads it from three branches (chunk sizes, and both sides of the
    block self-join), and without a checkpoint each branch re-ran the
    Arrow simhash UDF over the full corpus — 3x the signature cost,
    measured 19s vs 6s at sf1.0. The repartition spreads the one-split
    local fixture across cores (a 100-TB table arrives as thousands of
    splits and skips this); signature rows are 16 bytes."""
    sh = simhash_signatures(
        docs.repartition(
            docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
        )
    ).localCheckpoint(eager=True)
    # band on 4x16-bit chunks: near-dups agree on >=1 chunk w.h.p.
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk"))
    sizes = bands.groupBy("band", "chunk").agg(F.count(F.lit(1)).alias("n"))
    keep = sizes.filter((F.col("n") >= 2) & (F.col("n") <= max_chunk)).select(
        "band", "chunk"
    )
    metrics = sizes.filter(F.col("n") > max_chunk).select(
        F.lit("simhash_chunk_dropped").alias("metric"),
        F.concat_ws(":", F.col("band").cast("string"), F.col("chunk").cast("string")).alias("key"),
        F.col("n").alias("value"),
    )
    b_ok = bands.join(F.broadcast(keep), ["band", "chunk"])
    L = b_ok.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sig_a"), "band", "chunk")
    R = b_ok.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sig_b"), "band", "chunk")
    pairs = (
        L.join(R, ["band", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= hamming_max)
    )
    return pairs, metrics


def dd_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable simhash near-dup candidates.

    No SQL oracle: simhash is an approximate signature whose candidate
    set has no exact relational equivalent (driver records rows-only;
    exact-clone recall and the hub-chunk cap are pytest-asserted).
    """
    docs = read_table(spark, "documents", sf_dir).select("doc_id", "text")
    pairs, _metrics = simhash_pairs(docs)
    return pairs


def dd_simhash_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-EXACT simhash twin: signature -> banded-chunk blocking ->
    hamming verification, formulated so DuckDB computes bit-identical
    signatures (closing the round-3 gap where dd_simhash was the only
    dedup query without a hash-green driver row).

    Same pipeline shape as dd_simhash, different token hash: first 60
    bits of md5(token) (hex digits folded to a BIGINT — md5 is the one
    64-bit-capable hash both engines share), 60-bit majority bit-vote
    signature, 4x15-bit chunk-equality blocking with the hub-chunk cap
    (chunks with 2..MAX_LSH_BLOCK members kept, same no-silent-caps
    discipline), verification = bit_count(xor) <= 12. Every stage is
    JVM built-ins — no UDF, whole-stage codegen end to end; the Arrow
    crc32 variant (dd_simhash) stays as the throughput path since md5
    costs ~3x crc32 per token. Reference test-shape analog: the
    source-vs-dest reconciliation queries
    (Oracle/PCORNetLoader_ora.sql:2451-2565)."""
    docs = read_table(spark, "documents", sf_dir).select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("w"))
    hv = tf.withColumn("hx", F.substring(F.md5("tok"), 1, 15)).withColumn(
        "hv",
        F.expr(
            "aggregate(sequence(1,15), CAST(0 AS BIGINT), (acc, p) -> "
            "acc * 16 + CAST(instr('0123456789abcdef', substr(hx, p, 1)) - 1 AS BIGINT))"
        ),
    )
    votes = (
        hv.select(
            "doc_id", "w", "hv", F.explode(F.sequence(F.lit(0), F.lit(59))).alias("i")
        )
        .groupBy("doc_id", "i")
        .agg(
            F.sum(
                F.expr("w * (2 * (shiftright(hv, CAST(i AS INT)) & CAST(1 AS BIGINT)) - 1)")
            ).alias("v")
        )
    )
    sig = votes.groupBy("doc_id").agg(
        F.sum(
            F.expr(
                "CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)) "
                "ELSE CAST(0 AS BIGINT) END"
            )
        ).alias("simhash")
    )
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.expr(f"shiftright(simhash, {15 * j}) & CAST(32767 AS BIGINT)").alias(
                            "chunk"
                        ),
                    )
                    for j in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk"))
    keep = (
        bands.groupBy("band", "chunk")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= MAX_LSH_BLOCK))
        .select("band", "chunk")
    )
    b_ok = bands.join(F.broadcast(keep), ["band", "chunk"])
    L = b_ok.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sig_a"), "band", "chunk")
    R = b_ok.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sig_b"), "band", "chunk")
    return (
        L.join(R, ["band", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 12)
    )


ORACLE_DD_SIMHASH_VERIFY = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, COUNT(*)::BIGINT AS w FROM toks WHERE tok <> ''
  GROUP BY doc_id, tok
), hv AS (
  SELECT doc_id, w,
         list_sum(list_transform(range(1,16),
           p -> (strpos('0123456789abcdef', substr(md5(tok), p, 1)) - 1)::BIGINT
                << (4*(15-p))))::BIGINT AS hv
  FROM tf
), votes AS (
  SELECT doc_id, i, SUM(w * (2 * ((hv >> i) & 1) - 1)) AS v
  FROM hv CROSS JOIN range(0,60) t(i) GROUP BY doc_id, i
), sig AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN 1::BIGINT << i ELSE 0::BIGINT END)::BIGINT AS simhash
  FROM votes GROUP BY doc_id
), bands AS (
  SELECT doc_id, simhash, j AS band, (simhash >> (15*j)) & 32767 AS chunk
  FROM sig CROSS JOIN range(0,4) b(j)
), keep AS (
  SELECT band, chunk FROM bands GROUP BY band, chunk
  HAVING COUNT(*) >= 2 AND COUNT(*) <= {MAX_LSH_BLOCK}
), b_ok AS (
  SELECT bands.* FROM bands JOIN keep USING (band, chunk)
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       bit_count(xor(x.simhash, y.simhash))::INT AS hamming
FROM b_ok x JOIN b_ok y
  ON x.band = y.band AND x.chunk = y.chunk AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 12
ORDER BY a, b
"""


PASSAGE_WORDS = 4  # non-overlapping passage chunk size (words)


def passage_dedup(docs: DataFrame, chunk_words: int = PASSAGE_WORDS) -> DataFrame:
    """Sub-document exact dedup (the CCNet paragraph-dedup analog,
    shaped for this corpus's single-line documents): each document is
    chunked into non-overlapping `chunk_words`-word passages, and every
    passage that recurs in >= 2 distinct documents is emitted as
    (phash, n_docs, n_occ, first_doc).

    Scale: chunking is array-slot arithmetic inside codegen (no
    explode until the passage list exists), each passage is md5-hashed
    MAP-SIDE so the single shuffle carries only (16-byte hash, doc_id)
    pairs — passage text never crosses the wire, the same discipline as
    dd_exact. The group-by is a plain hash aggregation; a pathological
    passage that appears everywhere ("click here to subscribe") makes
    one hot group of cheap count/min partials, not a row explosion."""
    words = F.col("ws")  # materialized first — see _shingles note (CSE)
    n_chunks = F.ceil(F.size(words) / F.lit(float(chunk_words))).cast("int")
    passages = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), " "
        ),
    )
    return (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
        .select("doc_id", F.explode(passages).alias("passage"))
        .select("doc_id", F.md5("passage").alias("phash"))
        .groupBy("phash")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def dd_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        read_table(spark, "documents", sf_dir)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", "text")
    )
    return passage_dedup(docs)


ORACLE_DD_PASSAGE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
ch AS (
  SELECT doc_id,
         md5(array_to_string(ws[i*{PASSAGE_WORDS}+1 : i*{PASSAGE_WORDS}+{PASSAGE_WORDS}], ' ')) AS phash
  FROM w, UNNEST(range(CAST(ceil(len(ws)/{PASSAGE_WORDS}.0) AS BIGINT))) AS t(i)
)
SELECT phash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM ch GROUP BY phash HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY phash
"""


def canonical_url_col(raw):
    """Column-level URL canonicalization battery — strip the fragment,
    strip utm_* tracking parameters, lowercase the scheme+host prefix
    (the part of a URL that is case-insensitive by RFC 3986; the path
    is NOT lowercased), strip one trailing slash. Pure regexp/string
    ops inside codegen; the identical four rewrites run in the SQL
    oracles (dd_url, kg_linkgraph) so the mapping is bit-identical.
    Shared by the crawl-frontier dedup (dd_url) and the link-graph
    target normalization (kgforge.pipeline.kg_linkgraph)."""
    u = F.regexp_replace(raw, "#.*$", "")
    u = F.regexp_replace(u, r"[?&]utm_[a-z]+=[^&#]*", "")
    u = F.concat(
        F.lower(F.regexp_extract(u, "^[^/]*//[^/]*", 0)),
        F.regexp_replace(u, "^[^/]*//[^/]*", ""),
    )
    return F.regexp_replace(u, "/$", "")


def url_canonicalize(urls: DataFrame) -> DataFrame:
    """urls(doc_id, raw_url) -> (doc_id, raw_url, canonical_url) via
    canonical_url_col."""
    return urls.select(
        "doc_id", "raw_url", canonical_url_col(F.col("raw_url")).alias("canonical_url")
    )


def dd_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL dedup: deterministic messy variants (tracking params on
    every doc, SHOUTING host + fragment on even doc_ids, trailing
    slash on doc_id%3==0) are canonicalized and grouped — the crawl-
    frontier dedup every web pipeline runs before fetching. Variant
    synthesis is the same expression in both engines, so survivors are
    guaranteed at every sf and group sizes vary 1..3."""
    d = read_table(spark, "documents", sf_dir)
    base = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    v1 = F.concat(
        base, F.lit("?utm_source=feed&utm_campaign="),
        (F.col("doc_id") % 7).cast("string"),
    )
    v2 = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("HTTPS://"), F.upper("source"), F.lit(".EXAMPLE.COM/doc/"),
            F.col("doc_id").cast("string"), F.lit("#section-"),
            (F.col("doc_id") % 3).cast("string"),
        ),
    )
    v3 = F.when(F.col("doc_id") % 3 == 0, F.concat(base, F.lit("/")))
    raws = (
        d.select("doc_id", F.explode(F.array(v1, v2, v3)).alias("raw_url"))
        .filter(F.col("raw_url").isNotNull())
    )
    return (
        url_canonicalize(raws)
        .groupBy("canonical_url")
        .agg(
            F.countDistinct("raw_url").cast("long").alias("n_variants"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
    )


ORACLE_DD_URL = """
WITH raw AS (
  SELECT doc_id, raw_url FROM (
    SELECT doc_id, UNNEST([
      'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
        || '?utm_source=feed&utm_campaign=' || CAST(doc_id % 7 AS VARCHAR),
      CASE WHEN doc_id % 2 = 0 THEN
        'HTTPS://' || UPPER(source) || '.EXAMPLE.COM/doc/' || CAST(doc_id AS VARCHAR)
          || '#section-' || CAST(doc_id % 3 AS VARCHAR) END,
      CASE WHEN doc_id % 3 = 0 THEN
        'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) || '/' END
    ]) AS raw_url
    FROM documents
  ) WHERE raw_url IS NOT NULL
),
canon AS (
  SELECT doc_id, raw_url,
         regexp_replace(
           lower(regexp_extract(u2, '^[^/]*//[^/]*', 0))
             || regexp_replace(u2, '^[^/]*//[^/]*', ''),
           '/$', '') AS canonical_url
  FROM (
    SELECT doc_id, raw_url,
           regexp_replace(regexp_replace(raw_url, '#.*$', ''),
                          '[?&]utm_[a-z]+=[^&#]*', '', 'g') AS u2
    FROM raw
  )
)
SELECT canonical_url,
       CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_variants,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM canon GROUP BY canonical_url ORDER BY canonical_url
"""


# ---------------------------------------------------------------------------
# dd_robots — robots.txt crawl-frontier filtering
# ---------------------------------------------------------------------------

def robots_filter(frontier: DataFrame, host_rules: DataFrame) -> DataFrame:
    """Crawl-politeness gate: frontier(url, host, path) x
    host_rules(host, rules: array<struct<p: prefix, a: allow 0/1>>) ->
    one decision per url under the longest-match rule (Google's
    robots.txt algorithm: among matching rules the longest prefix wins;
    on a length tie Allow beats Disallow; no match means fetch).

    Scale shape: the frontier — the 10^12-row side — NEVER shuffles.
    Rules are per-host metadata (robots.txt is one fetch per host), so
    the join is a broadcast at dimension scale, and the winner
    selection is in-row codegen (filter + transform + array_max over a
    (len, allow, prefix) struct, lexicographic max = longest-match with
    allow-wins tie-break). Beyond broadcastable host counts the same
    plan works as a shuffle-hash join on host — the escape hatch is the
    caller dropping the broadcast hint, nothing in the winner logic
    changes."""
    path = F.col("path")
    matched = F.filter(
        F.col("rules"), lambda r: path.startswith(r.getField("p"))
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                F.length(r.getField("p")).alias("l"),
                r.getField("a").alias("a"),
                r.getField("p").alias("p"),
            ),
        )
    )
    return (
        frontier.join(F.broadcast(host_rules), "host", "left")
        .withColumn("_best", best)
        .select(
            frontier["*"],
            F.col("_best.p").alias("matched_rule"),
            F.when(
                F.col("_best").isNull() | (F.col("_best.a") == 1), F.lit("fetch")
            )
            .otherwise(F.lit("blocked"))
            .alias("decision"),
        )
    )


def dd_robots_from(d: DataFrame) -> DataFrame:
    """Frame-level dd_robots (docs(doc_id, source) -> decisions), so the
    N-vs-4N scaling gauntlet can drive it over its synthesized corpus."""
    did = F.col("doc_id")
    seg = (
        F.when(did % 5 == 0, F.concat(F.lit("/doc/"), did.cast("string")))
        .when(did % 5 == 1, F.concat(F.lit("/private/"), did.cast("string")))
        .when(did % 5 == 2, F.concat(F.lit("/private/ok/"), did.cast("string")))
        .when(did % 5 == 3, F.concat(F.lit("/tmp/"), did.cast("string")))
        .otherwise(F.concat(F.lit("/doc/archive/"), did.cast("string")))
    )
    frontier = d.select(
        did.alias("doc_id"),
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        seg.alias("path"),
    )
    s_idx = F.substring("source", 4, 8).cast("int")
    empty_rules = F.array().cast("array<struct<p:string,a:int>>")
    rules = (
        F.when(s_idx % 3 == 0, F.array(
            F.struct(F.lit("/private/").alias("p"), F.lit(0).alias("a")),
            F.struct(F.lit("/private/ok/").alias("p"), F.lit(1).alias("a")),
            F.struct(F.lit("/tmp/").alias("p"), F.lit(0).alias("a")),
        ))
        .when(s_idx % 3 == 1, F.array(
            F.struct(F.lit("/tmp/").alias("p"), F.lit(0).alias("a")),
        ))
        .otherwise(empty_rules)
    )
    host_rules = (
        d.select("source").distinct()
        .select(
            F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
            rules.alias("rules"),
        )
    )
    return (
        robots_filter(frontier, host_rules)
        .select("doc_id", "host", "path", "matched_rule", "decision")
    )


def dd_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt frontier filtering over a deterministic synthetic
    frontier: each doc contributes one url whose path class cycles
    through /doc/, /private/, /private/ok/, /tmp/ and /doc/archive/,
    and each host's parsed rule set varies by host index (full
    Disallow/Allow-exception set, Disallow /tmp/ only, or no robots.txt
    at all) — so longest-match overrides (/private/ok/ allowed inside
    disallowed /private/), plain blocks, and the no-rules path all
    carry rows at every sf and the check can never pass vacuously."""
    return dd_robots_from(read_table(spark, "documents", sf_dir))


ORACLE_DD_ROBOTS = """
WITH frontier AS (
  SELECT doc_id, source || '.example.com' AS host,
         CASE doc_id % 5
           WHEN 0 THEN '/doc/' || CAST(doc_id AS VARCHAR)
           WHEN 1 THEN '/private/' || CAST(doc_id AS VARCHAR)
           WHEN 2 THEN '/private/ok/' || CAST(doc_id AS VARCHAR)
           WHEN 3 THEN '/tmp/' || CAST(doc_id AS VARCHAR)
           ELSE '/doc/archive/' || CAST(doc_id AS VARCHAR)
         END AS path
  FROM documents
),
hosts AS (
  SELECT DISTINCT source, CAST(substring(source, 4) AS INT) AS s
  FROM documents
),
rules AS (
  SELECT source || '.example.com' AS host,
         UNNEST(CASE WHEN s % 3 = 0 THEN ['/private/', '/private/ok/', '/tmp/']
                     WHEN s % 3 = 1 THEN ['/tmp/']
                     ELSE [] END) AS prefix,
         UNNEST(CASE WHEN s % 3 = 0 THEN [0, 1, 0]
                     WHEN s % 3 = 1 THEN [0]
                     ELSE [] END) AS allow
  FROM hosts
),
best AS (
  SELECT doc_id, prefix, allow,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id
           ORDER BY length(prefix) DESC, allow DESC
         ) AS rn
  FROM frontier f JOIN rules r
    ON r.host = f.host AND starts_with(f.path, r.prefix)
)
SELECT f.doc_id, f.host, f.path,
       b.prefix AS matched_rule,
       CASE WHEN b.doc_id IS NULL OR b.allow = 1 THEN 'fetch'
            ELSE 'blocked' END AS decision
FROM frontier f LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
ORDER BY f.doc_id
"""


# ---------------------------------------------------------------------------
# dd_sitemap — sitemap.xml ingestion and recrawl scheduling
# ---------------------------------------------------------------------------

def sitemap_entries(sitemaps: DataFrame, xml_col: str = "xml") -> DataFrame:
    """(host, xml) -> one row per <url> entry: (host, url, lastmod).
    <loc> and <lastmod> are pulled with regexp_extract_all and re-zipped
    positionally — the same no-parser-UDF idiom as hyperlink extraction.
    Zero shuffle: the parse happens inside the sitemap scan."""
    xml = F.col(xml_col)
    loc = F.regexp_extract_all(xml, F.lit("<loc>([^<]*)</loc>"), F.lit(1))
    mod = F.regexp_extract_all(
        xml, F.lit("<lastmod>([^<]*)</lastmod>"), F.lit(1)
    )
    return sitemaps.select(
        "host",
        F.explode(F.arrays_zip(loc.alias("url"), mod.alias("lastmod"))).alias("e"),
    ).select("host", F.col("e.url").alias("url"),
             F.col("e.lastmod").alias("lastmod"))


def recrawl_decisions(entries: DataFrame, crawl_state: DataFrame) -> DataFrame:
    """Sitemap entries x crawl_state(url, fetch_date) -> per-url
    scheduling decision: 'new' (never fetched), 'refetch' (publisher
    lastmod is later than our fetch), 'fresh' otherwise. Dates compare
    as ISO strings, so both engines use identical lexicographic order.

    Scale: the crawl state is the 10^12-row side and arrives hash-
    partitioned by url; sitemap entries (pages a publisher LISTS) are
    orders of magnitude smaller, so the join shuffles only the entry
    side against the state's layout."""
    j = entries.join(crawl_state, "url", "left")
    return j.select(
        "url", "host", "lastmod", "fetch_date",
        F.when(F.col("fetch_date").isNull(), F.lit("new"))
        .when(F.col("lastmod") > F.col("fetch_date"), F.lit("refetch"))
        .otherwise(F.lit("fresh"))
        .alias("decision"),
    )


SITEMAP_SHARD = 50000  # the sitemap protocol caps one file at 50k urls


def dd_sitemap_from(d: DataFrame) -> DataFrame:
    """Frame-level dd_sitemap (docs(doc_id, source) -> schedule), so the
    N-vs-4N scaling gauntlet can drive it over its synthesized corpus.
    Sitemaps shard at the protocol's 50k-url cap (one XML string per
    (host, shard) — a sitemap-index file set), so no single reducer
    ever materializes an unbounded per-host string; the never-crawled
    probe url rides shard 0 only."""
    did = F.col("doc_id")
    shard = F.floor(did / SITEMAP_SHARD).cast("int")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
        did.cast("string"),
    )
    lastmod = F.date_format(
        F.date_add(F.to_date(F.lit("2023-01-01")), (did * 3 % 400).cast("int")),
        "yyyy-MM-dd",
    )
    entry = F.concat(
        F.lit("<url><loc>"), url, F.lit("</loc><lastmod>"), lastmod,
        F.lit("</lastmod></url>"),
    )
    host = F.concat(F.col("source"), F.lit(".example.com"))
    per_shard = (
        d.select(host.alias("host"), shard.alias("shard"), entry.alias("entry"))
        .groupBy("host", "shard")
        .agg(F.concat_ws("", F.sort_array(F.collect_list("entry"))).alias("body"))
    )
    new_entry = F.when(
        F.col("shard") == 0,
        F.concat(
            F.lit("<url><loc>https://"), F.col("host"),
            F.lit("/doc/new</loc><lastmod>2024-06-01</lastmod></url>"),
        ),
    ).otherwise(F.lit(""))
    sitemaps = per_shard.select(
        "host",
        F.concat(
            F.lit("<urlset>"), new_entry, F.col("body"), F.lit("</urlset>"),
        ).alias("xml"),
    )
    # fetch dates get their own day-granular spread (doc_id*7%500 days)
    # so lastmod-vs-fetch lands on both sides at every sf — the
    # second-granular warc_ts offset collapses to one date at test scale
    crawl_state = d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            did.cast("string"),
        ).alias("url"),
        F.date_format(
            F.date_add(F.to_date(F.lit("2023-01-01")),
                       (did * 7 % 500).cast("int")),
            "yyyy-MM-dd",
        ).alias("fetch_date"),
    )
    return (
        recrawl_decisions(sitemap_entries(sitemaps), crawl_state)
    )


def dd_sitemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-discovery end to end over deterministic synthetic
    sitemaps: each host publishes one sitemap.xml listing its own pages
    (lastmod = 2023-01-01 + doc_id*3%400 days, straddling the fetch
    dates so refetch and fresh both occur) plus one never-crawled url
    ('new'). The XML is BUILT as a string per host (string-sorted
    entries in both engines), then parsed back through the real
    regexp-zip path — so parse, join and decision are all exercised and
    oracle-checked."""
    return dd_sitemap_from(read_table(spark, "documents", sf_dir))


ORACLE_DD_SITEMAP = """
WITH entries_raw AS (
  SELECT source || '.example.com' AS host,
         CAST(floor(doc_id / 50000) AS INT) AS shard,
         '<url><loc>https://' || source || '.example.com/doc/'
           || CAST(doc_id AS VARCHAR) || '</loc><lastmod>'
           || strftime(DATE '2023-01-01' + to_days(CAST(doc_id * 3 % 400 AS INT)),
                       '%Y-%m-%d')
           || '</lastmod></url>' AS entry
  FROM documents
),
sitemaps AS (
  SELECT host,
         '<urlset>'
           || CASE WHEN shard = 0 THEN '<url><loc>https://' || host
                || '/doc/new</loc><lastmod>2024-06-01</lastmod></url>'
              ELSE '' END
           || string_agg(entry, '' ORDER BY entry) || '</urlset>' AS xml
  FROM entries_raw GROUP BY host, shard
),
entries AS (
  SELECT host,
         UNNEST(regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1)) AS url,
         UNNEST(regexp_extract_all(xml, '<lastmod>([^<]*)</lastmod>', 1)) AS lastmod
  FROM sitemaps
),
crawl_state AS (
  SELECT 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         strftime(DATE '2023-01-01' + to_days(CAST(doc_id * 7 % 500 AS INT)),
                  '%Y-%m-%d') AS fetch_date
  FROM documents
)
SELECT e.url, e.host, e.lastmod, c.fetch_date,
       CASE WHEN c.fetch_date IS NULL THEN 'new'
            WHEN e.lastmod > c.fetch_date THEN 'refetch'
            ELSE 'fresh' END AS decision
FROM entries e LEFT JOIN crawl_state c USING (url)
ORDER BY e.url
"""


DD_BLOOM_WORDS = 64  # deliberately small at test scale so FALSE POSITIVES
DD_BLOOM_K = 3       # actually occur and the oracle verifies them too


def dd_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-batch exact dedup behind a Bloom prefilter: the base
    corpus's content hashes build a blocked Bloom bitmap
    (kgforge.operators.bloom); a synthetic new batch — the doc_id%10==0
    exact clones plus doc_id%10==7 genuinely-new texts — probes it, and
    only bloom-passing rows reach the exact md5 verification join.

    Output one row per new doc: (new_id, bloom_pass, dup_of). The
    oracle recomputes the FILTER ITSELF (same 60-bit md5 hash, same
    word/mask arithmetic — validated bit-identical across engines), so
    the driver hash verifies bloom semantics including which non-dups
    false-positive through, not just the final dedup. Invariant (pytest
    + construction): dup_of non-null ⇒ bloom_pass — a Bloom filter has
    no false negatives.

    The bitmap here is 64 words so the filter is saturated enough to
    produce real FPs at 500-5000 docs; production sizing is the module
    default (1 Mbit per ~100k keys ≈ 1% FP), and the bitmap stays
    constant-size however large the base corpus grows — the property
    that makes it broadcastable where a semi-join key set is not."""
    from kgforge.operators import bloom as B

    base = read_table(spark, "documents", sf_dir).select("doc_id", "text")
    newb = (
        base.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 100000).alias("new_id"), "text")
        .unionByName(
            base.filter(F.col("doc_id") % 10 == 7).select(
                (F.col("doc_id") + 200000).alias("new_id"),
                F.concat(F.col("text"), F.lit(" batchtag")).alias("text"),
            )
        )
    )
    bloom = B.bloom_build(
        base.select("text"), B.h60_md5(F.col("text")), DD_BLOOM_WORDS, DD_BLOOM_K
    )
    probed = B.bloom_probe(
        newb, B.h60_md5(F.col("text")), bloom, DD_BLOOM_WORDS, DD_BLOOM_K
    )
    cand = probed.filter(F.col("bloom_pass")).select(
        "new_id", F.md5("text").alias("m")
    )
    dups = (
        cand.join(base.select(F.md5("text").alias("m"), "doc_id"), "m")
        .groupBy("new_id")
        .agg(F.min("doc_id").cast("long").alias("dup_of"))
    )
    return (
        probed.select("new_id", "bloom_pass")
        .join(dups, "new_id", "left")
        .select("new_id", "bloom_pass", "dup_of")
    )


_H60_SQL = (
    "list_sum(list_transform(range(1,16), "
    "p -> (strpos('0123456789abcdef', substr(md5(text), p, 1)) - 1)::BIGINT"
    " << (4*(15-p))))::BIGINT"
)
# bit positions % 63: DuckDB raises on 1::BIGINT << 63 (see bloom.py)
_MASK_SQL = " | ".join(
    f"(1::BIGINT << (((h >> {6 * j}) & 63) % 63))" for j in range(1, DD_BLOOM_K + 1)
)

ORACLE_DD_BLOOM = f"""
WITH base AS (SELECT doc_id, text FROM documents),
newb AS (
  SELECT doc_id + 100000 AS new_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 200000, text || ' batchtag' FROM documents WHERE doc_id % 10 = 7
),
bh AS (SELECT doc_id, md5(text) AS m, {_H60_SQL} AS h FROM base),
bloom AS (
  SELECT h % {DD_BLOOM_WORDS} AS word_idx, bit_or({_MASK_SQL}) AS bits
  FROM bh GROUP BY h % {DD_BLOOM_WORDS}
),
nh AS (SELECT new_id, md5(text) AS m, {_H60_SQL} AS h FROM newb),
pass AS (
  SELECT new_id, m,
         COALESCE((bits & ({_MASK_SQL})) = ({_MASK_SQL}), FALSE) AS bloom_pass
  FROM nh LEFT JOIN bloom ON nh.h % {DD_BLOOM_WORDS} = bloom.word_idx
),
dups AS (
  SELECT p.new_id, CAST(MIN(bh.doc_id) AS BIGINT) AS dup_of
  FROM pass p JOIN bh ON p.m = bh.m
  WHERE p.bloom_pass GROUP BY p.new_id
)
SELECT pass.new_id, pass.bloom_pass, dups.dup_of
FROM pass LEFT JOIN dups ON pass.new_id = dups.new_id
ORDER BY pass.new_id
"""


DD_LINES_WORDS = 8  # words per synthesized body line
DD_LINES_T = 10     # a line in >= T distinct docs is boilerplate


def line_dedup(docs: DataFrame, t: int = DD_LINES_T) -> DataFrame:
    """Cross-document boilerplate line removal (the CCNet/RefinedWeb
    paragraph-dedup discipline, Wenzek et al. 2020: hash every line
    corpus-wide, drop lines that recur across many documents — nav
    bars, cookie banners, copyright footers). `docs` must carry a
    `lines` array column; emits one row per doc with the post-removal
    content hash so the check proves actual removal, not just counts.

    100-TB shape: line text NEVER shuffles — each line is md5-hashed
    map-side and only (16-byte hash, doc_id) crosses the wire for the
    frequency count (dd_passage's discipline); the boilerplate set
    (lines above the threshold — by construction at most
    total_lines/T DISTINCT values, and in practice the tiny head of
    the line-frequency distribution) comes back as ONE broadcast row
    of sorted hashes (the DSIR model-row idiom), so the removal pass
    is zero-shuffle whole-stage codegen over the original in-row line
    arrays. If the boiler set ever outgrew a broadcast, the same plan
    degrades to a hash-only shuffle semi-join — the text side still
    never moves."""
    # materialize the lines frame once (r06): the boiler-count branch
    # and the removal pass below both read it, and without a checkpoint
    # each branch re-ran the caller's line synthesis over the corpus
    docs = docs.localCheckpoint(eager=False)
    ex = docs.select(
        "doc_id", F.explode("lines").alias("line")
    ).select("doc_id", F.md5("line").alias("lhash"))
    boiler = (
        ex.groupBy("lhash")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= t)
    )
    brow = boiler.agg(
        F.sort_array(F.collect_list("lhash")).alias("bhl")
    )
    is_kept = lambda x: ~F.array_contains(F.col("bhl"), F.md5(x))  # noqa: E731
    kept = F.filter("lines", is_kept)
    n_lines = F.size("lines")
    n_boiler = (n_lines - F.size(kept)).cast("long")
    return docs.crossJoin(F.broadcast(brow)).select(
        "doc_id",
        n_lines.cast("long").alias("n_lines"),
        n_boiler.alias("n_boiler"),
        F.round(
            n_boiler.cast("double") / n_lines.cast("double"), 9
        ).alias("boiler_frac"),
        F.md5(F.array_join(kept, "\n")).alias("kept_md5"),
    )


def dd_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate dedup over deterministically synthesized
    page lines: every doc gets a per-source copyright header and
    subscribe footer (the duplicated-across-the-crawl boilerplate —
    each recurs in 25-250 docs depending on sf) around its body split
    into DD_LINES_WORDS-word lines (organically near-unique). The
    synthesis is the same expression in both engines (the dd_url
    idiom), so boilerplate survivors exist at every sf and the check
    can never pass vacuously."""
    # fan the 1-split local fixture across cores before the line build
    # (consumed by both the boiler-count branch and the removal pass)
    d = (
        read_table(spark, "documents", sf_dir)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", "source", F.split("text", " ").alias("ws"))
    )
    n_chunks = F.ceil(F.size("ws") / F.lit(float(DD_LINES_WORDS))).cast("int")
    body = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice("ws", i * DD_LINES_WORDS + 1, DD_LINES_WORDS), " "
        ),
    )
    header = F.concat(F.lit("copyright "), F.col("source"), F.lit(" all rights reserved"))
    footer = F.concat(F.lit("subscribe to "), F.col("source"), F.lit(" newsletter updates"))
    lines = F.concat(F.array(header), body, F.array(footer))
    return line_dedup(
        d.select("doc_id", lines.alias("lines"))
    )


ORACLE_DD_LINES = f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
ls AS (
  SELECT doc_id,
         ['copyright ' || source || ' all rights reserved']
         || list_transform(range(CAST(ceil(len(ws)/{DD_LINES_WORDS}.0) AS BIGINT)),
              i -> array_to_string(ws[i*{DD_LINES_WORDS}+1 : i*{DD_LINES_WORDS}+{DD_LINES_WORDS}], ' '))
         || ['subscribe to ' || source || ' newsletter updates'] AS lines
  FROM w
),
ex AS (SELECT doc_id, md5(unnest(lines)) AS lhash FROM ls),
boiler AS (SELECT lhash FROM ex GROUP BY lhash
           HAVING count(DISTINCT doc_id) >= {DD_LINES_T}),
brow AS (SELECT coalesce(list(lhash ORDER BY lhash), []) AS bhl FROM boiler),
kept AS (
  SELECT doc_id, lines,
         list_filter(lines, x -> NOT list_contains(bhl, md5(x))) AS kl
  FROM ls, brow
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(lines) - len(kl) AS BIGINT) AS n_boiler,
       round(CAST(len(lines) - len(kl) AS DOUBLE) / CAST(len(lines) AS DOUBLE), 9)
         AS boiler_frac,
       md5(coalesce(array_to_string(kl, chr(10)), '')) AS kept_md5
FROM kept ORDER BY doc_id
"""


DD_SUB_L = 6  # duplicated-substring gram length, in words

# rotation step (bits per word offset) for the rolling gram hash; odd so
# offsets 0..63 all get distinct rotations of the 64-bit word hash
_GRAM_ROT = 7


def _rot64(col, bits: int):
    b = bits % 64
    if b == 0:
        return col
    return F.shiftleft(col, b).bitwiseOR(F.shiftrightunsigned(col, 64 - b))


def _xor_rot(bits: int):
    # closure factory, NOT a default arg: pyspark derives the lambda's
    # arity from its full parameter list, so a bound default would be
    # handed a third lambda variable
    return lambda x, y: x.bitwiseXOR(_rot64(y, bits))


def _rolling_gram_hashes(wh, n, L: int):
    """L-gram hashes from per-word hashes without building gram strings:
    gh[i] = XOR_{j<L} rotl64(wh[i+j], j*_GRAM_ROT), assembled in
    O(log L) zip_with passes by window doubling (pw[w][i] covers words
    i..i+w-1; pw[2w][i] = pw[w][i] XOR rotl(pw[w][i+w], w*R)), then the
    binary decomposition of L. The r4 shape hashed an L-word string per
    position (xxhash64 over array_join(slice(ws,..))) — O(n*L) word
    copies + string allocs per doc, the dominant DRAM traffic of the
    gram stage; this is pure long arithmetic on arrays, no strings, and
    the bit ops can't overflow so ANSI mode is indifferent. Equal grams
    hash equal by construction; distinct grams collide at the same
    ~2^-64 birthday rate the old 64-bit hash already accepted (word
    hashes are xxhash64, so rotated XOR combinations are
    indistinguishable from random for non-adversarial text). The DuckDB
    oracle is unaffected: it detects duplicates on md5 of the gram
    STRING, so any injective-whp gram hash matches it.

    `wh` is a Column of array<bigint> (per-word hashes), `n` a Column
    with its length, `L` a plan-time python int >= 1."""
    if L == 1:
        return wh
    pw = {1: wh}
    w = 1
    while 2 * w <= L:
        a, step = pw[w], w
        out_len = n - 2 * step + 1  # >= 1 whenever n >= L (guarded by caller)
        pw[2 * w] = F.zip_with(
            F.slice(a, 1, out_len),
            F.slice(a, step + 1, out_len),
            _xor_rot(step * _GRAM_ROT),
        )
        w *= 2
    # combine the binary decomposition of L, widest window first
    parts = []
    rem = L
    while rem:
        p = 1 << (rem.bit_length() - 1)
        parts.append(p)
        rem -= p
    cur, off = pw[parts[0]], parts[0]
    for p in parts[1:]:
        out_len = n - L + 1 if off + p == L else n - (off + p) + 1
        cur = F.zip_with(
            F.slice(cur, 1, out_len),
            F.slice(pw[p], off + 1, out_len),
            _xor_rot(off * _GRAM_ROT),
        )
        off += p
    return cur


def substr_dedup(docs: DataFrame, L: int = DD_SUB_L) -> DataFrame:
    """ExactSubstr-style duplicated-span removal (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better": find
    every substring that occurs more than once in the corpus and cut
    the duplicated spans — the paper uses a suffix array over bytes;
    the distributed equivalent is corpus-wide duplicated L-gram
    detection with per-doc maximal-span merging, word-level here).
    `docs` must carry a `ws` words-array column; emits per doc the
    gram/dup/span counts, the covered-word fraction, and the md5 of
    the text with covered spans removed (residual content, not just
    counts).

    100-TB shape: gram text never shuffles — each L-gram is hashed to
    8 bytes (xxhash64) map-side and only (doc_id, pos, hash) crosses
    the wire. Membership of each position in the duplicated set is a
    hash SEMI-JOIN on the gram hash, with the dup head FORCED to
    broadcast — a choice made by controlled experiment, not
    assumption. The A/B at 4M docs (BENCH/scaling_text_r04_4m_v4 vs
    _v5.json, same synth recipe, back-to-back windows, identical
    output checksums): un-hinted, AQE sized the dup head over its
    threshold and picked a shuffle join, which re-exchanges the full
    O(corpus-grams) position table — 578→809s at local[2] AND
    194→286s at local[8]; the broadcast probe stays map-side and wins
    at both levels because probe-side wire cost dominates the driver
    round-trip by orders of magnitude. The dup head scales with
    corpus dup mass, so at the scale where it outgrows driver/executor
    memory the shuffle semi-join AQE picked here IS the correct (and
    only exact) fallback — it is a constant factor slower, not a
    scaling cliff, and every byte of it moves executor-to-executor in
    parallel. A bloom pre-probe can cut its wire cost (probe the
    constant-size filter map-side, shuffle only probable-dup
    positions) but cannot replace the exact join: a bloom false
    positive would mark a unique gram duplicated and corrupt the
    span output. dd_substr's N-vs-4N plateau of
    ~0.71-0.75 on this box is the same with either join shape — the
    op is DRAM-bandwidth-bound (wide array arithmetic per row), and
    4x the cores of ONE socket do not bring 4x the memory bandwidth;
    a real 4x-node cluster scales the bandwidth with the cores. The
    probe is still NOT an array_contains scan: a first cut carried the dup set as one
    broadcast array row and scanned it per position, which is
    O(npos x |dup|) linear work per doc — 21.7s at sf0.1 vs ~1s for
    this shape. Duplicated positions come back per doc as a small int
    array through a SHUFFLE-HASH join on doc_id against the pinned
    doc_id repartition of the text side (partitionings align, so the
    text is exchanged once and the join adds no sort): a second cut
    broadcast the position table, and the 4M-doc N-vs-4N run showed
    why that was wrong — with ~308k docs in dup groups the position
    side is tens of MB, and the driver-side collect+rebroadcast is a
    serial constant that capped scaling efficiency at 0.55; as a
    shuffled join every byte of it moves executor-to-executor in
    parallel.
    Span detection + merging + removal are zero-shuffle in-row array
    ops, all hash-set based (array_except), never array_contains loops:
    covered word indices are the union of [p, p+L) over duplicated
    positions; span starts are covered indices c with c-1 not covered
    (array_except(cov, cov+1) — interval-merge equivalent); kept words
    are the uncovered indices (array_except(0..n-1, cov), which keeps
    first-array order). The scoring pass is pinned-repartitioned by
    doc_id (the bm25/lmscore lesson: broadcast joins keep the probe
    side's single-split partitioning at test scale)."""
    npos = F.size("ws") - L + 1
    gh = F.when(
        npos > 0,
        _rolling_gram_hashes(
            F.transform("ws", lambda w: F.xxhash64(w)), F.size("ws"), L
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    ex = docs.select("doc_id", F.posexplode(gh).alias("pos", "h"))
    dup = (
        ex.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("h")
    )
    dpos = (
        ex.join(F.broadcast(dup), "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("dpos"))
    )
    dp = (
        docs.select("doc_id", "ws")
        .repartition(
            docs.sparkSession.sparkContext.defaultParallelism, F.col("doc_id")
        )
        .join(dpos.hint("SHUFFLE_HASH"), "doc_id", "left")
        .select(
            "doc_id",
            "ws",
            F.coalesce("dpos", F.array().cast("array<int>")).alias("dpos"),
        )
    )
    covered = F.array_sort(
        F.array_distinct(
            F.flatten(
                F.transform("dpos", lambda p: F.sequence(p, p + L - 1))
            )
        )
    )
    # clean-doc fast path (r5): in a deduplicated corpus MOST documents
    # have zero duplicated grams, yet the r4 plan made every row pay the
    # full span machinery — materialize covered, build sequence(0,n-1),
    # hash-set array_except, gather kept words — only to reconstruct the
    # original text. CASE WHEN branches are codegen if/else (evaluated
    # per row, branch-local), so gating the whole chain on n_dup_grams
    # drops the wide-array DRAM traffic to the dup minority; clean rows
    # pay exactly the mandatory md5(array_join(ws)) output cost.
    dp = dp.select(
        "doc_id", "ws", F.size("dpos").alias("n_dup_grams"),
        F.when(F.size("dpos") > 0, covered)
        .otherwise(F.array().cast("array<int>"))
        .alias("cov"),
    )
    n_words = F.size("ws")
    n_cov = F.size("cov")
    has_dup = F.col("n_dup_grams") > 0
    n_spans = F.when(
        has_dup,
        F.size(F.array_except("cov", F.transform("cov", lambda c: c + 1))),
    ).otherwise(F.lit(0))
    kept = F.transform(
        F.array_except(F.sequence(F.lit(0), n_words - 1), F.col("cov")),
        lambda i: F.element_at("ws", i + 1),
    )
    clean_text = F.when(has_dup, F.array_join(kept, " ")).otherwise(
        F.array_join("ws", " ")
    )
    return dp.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        (n_words - L + 1).cast("long").alias("n_grams"),
        F.col("n_dup_grams").cast("long"),
        n_cov.cast("long").alias("n_covered"),
        n_spans.cast("long").alias("n_spans"),
        F.round(n_cov.cast("double") / n_words.cast("double"), 9).alias("dup_frac"),
        F.md5(clean_text).alias("clean_md5"),
    )


def dd_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span removal over pages that share a deterministic
    per-source syndication preamble (the dd_url/dd_lines synthesis
    idiom: every doc from a source opens with the same 9-word wire
    header, so cross-document duplicated spans exist at every sf and
    the check can never pass vacuously; the body contributes organic
    duplicated grams at larger sf)."""
    # fan the 1-split local fixture across cores BEFORE the gram-hash
    # pass — without this the rolling-hash stage (the op's dominant
    # arithmetic) runs on one task (r06; a 100-TB table arrives as
    # thousands of splits and skips this)
    d = (
        read_table(spark, "documents", sf_dir)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            F.concat(
                F.split(
                    F.concat(
                        F.lit("shared preamble from "),
                        F.col("source"),
                        F.lit(" syndicated wire copy header today"),
                    ),
                    " ",
                ),
                F.split("text", " "),
            ).alias("ws"),
        )
    )
    return substr_dedup(d)


ORACLE_DD_SUBSTR = f"""
WITH w AS (
  SELECT doc_id,
         list_concat(
           string_split('shared preamble from ' || source
                        || ' syndicated wire copy header today', ' '),
           string_split(text, ' ')) AS ws
  FROM documents
),
g AS (SELECT doc_id, ws,
             list_transform(range(0, len(ws) - {DD_SUB_L} + 1),
               i -> md5(array_to_string(ws[i+1 : i+{DD_SUB_L}], ' '))) AS gh
      FROM w),
dup AS (SELECT h FROM (SELECT unnest(gh) AS h FROM g) x
        GROUP BY h HAVING count(*) > 1),
brow AS (SELECT coalesce(list(h ORDER BY h), []) AS bh FROM dup),
marked AS (
  SELECT doc_id, ws,
         list_filter(range(0, len(gh)),
                     i -> list_contains(bh, gh[i+1])) AS dpos
  FROM g, brow
),
cov AS (
  SELECT doc_id, ws, len(dpos) AS n_dup_grams,
         list_sort(list_distinct(flatten(
           list_transform(dpos, p -> range(p, p + {DD_SUB_L}))))) AS cv
  FROM marked
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(ws) - {DD_SUB_L} + 1 AS BIGINT) AS n_grams,
       CAST(n_dup_grams AS BIGINT) AS n_dup_grams,
       CAST(len(cv) AS BIGINT) AS n_covered,
       CAST(len(list_filter(cv, c -> NOT list_contains(cv, c - 1))) AS BIGINT)
         AS n_spans,
       round(CAST(len(cv) AS DOUBLE) / CAST(len(ws) AS DOUBLE), 9) AS dup_frac,
       md5(coalesce(array_to_string(
         list_transform(
           list_filter(range(0, len(ws)), i -> NOT list_contains(cv, i)),
           i -> ws[i+1]), ' '), '')) AS clean_md5
FROM cov ORDER BY doc_id
"""


def dd_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTER assignment + keeper selection — the full
    dedup decision, not just the pair list: MinHash->LSH->exact-verify
    pairs (the dd_minhash_lsh path, whose output equals the exact
    all-pairs baseline) -> connected components -> every doc labeled
    with its cluster representative (min doc_id), the cluster size, and
    keep/drop. This is the step that turns pair detection into an
    actionable training-data filter (the reference analog is the
    preferred-synonym dedup rank, Oracle/PCORNetLoader_ora.sql:600-640;
    the LLM-corpus analog is keeper selection in Lee et al. 2021 /
    RefinedWeb).

    100-TB shape: CC runs only over the verified-duplicate edge set
    (tiny vs corpus — kgforge.canon's adaptive local/distributed branch
    with the memory-derived threshold); cluster labels + sizes come
    back as a broadcast join keyed on doc_id, so the corpus side never
    shuffles; singletons never enter any join state (they default via
    coalesce). The DuckDB oracle recomputes components independently
    with a recursive-CTE transitive closure over the exact-Jaccard pair
    list, so the whole chain — candidate generation, verification, CC,
    keeper choice — is hash-checked end to end."""
    from kgforge import canon as C

    docs = (
        read_table(spark, "documents", sf_dir)
        .select(F.col("doc_id").alias("url"), "text")
    )
    # same signature/pair checkpoint discipline as dd_minhash_lsh (r06)
    dp = docs.repartition(spark.sparkContext.defaultParallelism, "url")
    sigs = C.minhash_signatures(dp, "text", "url", n_perms=MINHASH_PERMS).localCheckpoint(
        eager=True
    )
    blocks = C.lsh_blocks(sigs, n_bands=LSH_BANDS, id_col="url")
    pairs, _metrics = C.candidate_pairs(blocks, id_col="url", max_block=MAX_LSH_BLOCK)
    pairs = pairs.localCheckpoint(eager=True)
    verified = C.verify_pairs_jaccard(pairs, docs, JACCARD_T, "url", "text")
    comp = C.connected_components(
        verified.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    comp_sized = comp.join(
        comp.groupBy("comp").agg(F.count(F.lit(1)).alias("csz")), "comp"
    )
    return (
        docs.select(F.col("url").alias("doc_id"))
        .join(F.broadcast(comp_sized), F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce("comp", F.col("doc_id")).cast("long").alias("cluster_rep"),
            F.coalesce("csz", F.lit(1)).cast("long").alias("cluster_size"),
            F.when(
                F.coalesce("comp", F.col("doc_id")) == F.col("doc_id"), "keep"
            )
            .otherwise("drop")
            .alias("decision"),
        )
    )


ORACLE_DD_CLUSTERS = """
WITH RECURSIVE sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(string_split(text,' ')) <= 3
         THEN [array_to_string(string_split(text,' '), ' ')]
         ELSE list_transform(range(0, len(string_split(text,' ')) - 2),
                i -> array_to_string((string_split(text,' '))[i+1:i+3], ' '))
    END)) AS shingle
  FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_inter
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
dup_pairs AS (
  SELECT a, b FROM inter
  JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
),
edges AS (
  SELECT a AS u, b AS v FROM dup_pairs
  UNION ALL SELECT b AS u, a AS v FROM dup_pairs
),
reach(id, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, rr.r FROM edges e JOIN reach rr ON rr.id = e.v
),
comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
csz AS (SELECT comp, COUNT(*) AS csz FROM comp GROUP BY comp)
SELECT d.doc_id,
       CAST(coalesce(c.comp, d.doc_id) AS BIGINT) AS cluster_rep,
       CAST(coalesce(z.csz, 1) AS BIGINT) AS cluster_size,
       CASE WHEN coalesce(c.comp, d.doc_id) = d.doc_id THEN 'keep'
            ELSE 'drop' END AS decision
FROM documents d
LEFT JOIN comp c ON c.id = d.doc_id
LEFT JOIN csz z ON z.comp = c.comp
ORDER BY d.doc_id
"""


SNAPSHOT_EPOCH0 = 1_704_067_200  # 2024-01-01T00:00:00Z
SNAPSHOT_GAP_S = 2_592_000       # 30 days between recrawls of a url


def recrawl_snapshots(docs: DataFrame) -> DataFrame:
    """docs(doc_id, source, text) -> synthetic recrawl history
    (url, crawl_no, ts_epoch, content_md5): every url is fetched
    1 + doc_id%3 times 30 days apart, and snapshot c>0 rewrites the
    page (appends ' rev{c}') exactly when (doc_id + c) % 2 == 0 — so
    histories include never-changed, changed-then-stable, and
    changed-then-reverted shapes at every sf. Content is hashed
    MAP-SIDE (md5); full text never reaches the snapshot shuffle."""
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
        did.cast("string"),
    )
    snaps = docs.select(
        did.alias("doc_id"), url.alias("url"), "text",
        F.explode(
            F.sequence(F.lit(0), (did % 3).cast("int"))
        ).alias("crawl_no"),
    )
    c = F.col("crawl_no")
    rev = F.when(
        (c > 0) & ((F.col("doc_id") + c) % 2 == 0),
        F.concat(F.lit(" rev"), c.cast("string")),
    ).otherwise(F.lit(""))
    return snaps.select(
        "url",
        c.cast("long").alias("crawl_no"),
        (
            F.lit(SNAPSHOT_EPOCH0)
            + (F.col("doc_id") % 365) * 86400
            + c.cast("long") * SNAPSHOT_GAP_S
        ).cast("long").alias("ts_epoch"),
        F.md5(F.concat(F.col("text"), rev)).alias("content_md5"),
    )


def snapshot_dedup(snaps: DataFrame) -> DataFrame:
    """Cross-crawl snapshot dedup — the keep-latest pass every
    Common-Crawl-style corpus runs when the same url appears in
    multiple crawls (reference analog: the latest-wins MERGE post-pass,
    Oracle/PCORNetLoader_ora.sql:2451-2565, re-keyed to crawl history).
    Per url: snapshot count, latest fetch (the kept version), distinct
    content versions, and the change count from consecutive-hash
    comparison (lag window).

    Scale: ONE shuffle on url — the lag window partitions by url, and
    the following per-url aggregation reuses that partitioning (urls
    are unique keys, so there is no skew to salt); the shuffle rows are
    (url, 8-byte epoch, 16-byte md5), never page bytes. At 10^12 docs
    this is the same single-exchange shape as dd_exact."""
    w = Window.partitionBy("url").orderBy("crawl_no")
    prev = F.lag("content_md5").over(w)
    ch = snaps.withColumn(
        "changed",
        (prev.isNotNull() & (F.col("content_md5") != prev)).cast("int"),
    )
    return (
        ch.groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_snapshots"),
            F.max("ts_epoch").cast("long").alias("latest_epoch"),
            F.expr("max_by(content_md5, crawl_no)").alias("latest_md5"),
            F.countDistinct("content_md5").cast("long").alias("n_versions"),
            F.sum("changed").cast("long").alias("n_changes"),
        )
    )


def dd_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, "documents", sf_dir).select("doc_id", "source", "text")
    return snapshot_dedup(recrawl_snapshots(d))


ORACLE_DD_SNAPSHOTS = f"""
WITH snaps AS (
  SELECT 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         c AS crawl_no,
         {SNAPSHOT_EPOCH0} + (doc_id % 365) * 86400 + c * {SNAPSHOT_GAP_S} AS ts_epoch,
         md5(text || CASE WHEN c > 0 AND (doc_id + c) % 2 = 0
                          THEN ' rev' || CAST(c AS VARCHAR) ELSE '' END) AS content_md5
  FROM documents, UNNEST(range(doc_id % 3 + 1)) AS t(c)
),
ch AS (
  SELECT url, crawl_no, ts_epoch, content_md5,
         CASE WHEN lag(content_md5) OVER (PARTITION BY url ORDER BY crawl_no) IS NOT NULL
                   AND content_md5 <> lag(content_md5) OVER (PARTITION BY url ORDER BY crawl_no)
              THEN 1 ELSE 0 END AS changed
  FROM snaps
)
SELECT url,
       CAST(COUNT(*) AS BIGINT) AS n_snapshots,
       CAST(MAX(ts_epoch) AS BIGINT) AS latest_epoch,
       arg_max(content_md5, crawl_no) AS latest_md5,
       CAST(COUNT(DISTINCT content_md5) AS BIGINT) AS n_versions,
       CAST(SUM(changed) AS BIGINT) AS n_changes
FROM ch GROUP BY url ORDER BY url
"""


# ---- driver-facing compound ------------------------------------------
# dd_exact / dd_passage / dd_url / dd_bloom melt into ONE registered
# query (dd_stats) via the same machinery as the rel_*/tx_* compounds —
# every cell of every standalone result is still value-hash-compared
# against the identically-melted DuckDB oracle. This freed two driver
# registry slots (the cap is ~50 recorded rows) while ADDING dd_bloom.

_DD_CELLS = {
    "dd_exact": (
        None, ["text_md5"], [("keeper_doc_id", "n"), ("n_copies", "n")]
    ),
    "dd_passage": (
        None, ["phash"], [("n_docs", "n"), ("n_occ", "n"), ("first_doc", "n")]
    ),
    "dd_url": (
        None, ["canonical_url"],
        [("n_variants", "n"), ("n_rows", "n"), ("first_doc", "n")],
    ),
    "dd_bloom": (None, ["new_id"], [("bloom_pass", "s"), ("dup_of", "n")]),
    "dd_lines": (
        None, ["doc_id"],
        [("n_lines", "n"), ("n_boiler", "n"), ("boiler_frac", "n"),
         ("kept_md5", "s")],
    ),
    "dd_substr": (
        None, ["doc_id"],
        [("n_words", "n"), ("n_grams", "n"), ("n_dup_grams", "n"),
         ("n_covered", "n"), ("n_spans", "n"), ("dup_frac", "n"),
         ("clean_md5", "s")],
    ),
    "dd_clusters": (
        None, ["doc_id"],
        [("cluster_rep", "n"), ("cluster_size", "n"), ("decision", "s")],
    ),
    "dd_semdedup": (
        None, ["dup_id"],
        [("keeper_id", "n"), ("cos_keeper", "n"), ("n_above", "n"),
         ("cell", "n")],
    ),
    "dd_snapshots": (
        None, ["url"],
        [("n_snapshots", "n"), ("latest_epoch", "n"), ("latest_md5", "s"),
         ("n_versions", "n"), ("n_changes", "n")],
    ),
    "dd_robots": (
        None, ["doc_id"],
        [("host", "s"), ("path", "s"), ("matched_rule", "s"),
         ("decision", "s")],
    ),
    "dd_sitemap": (
        None, ["url"],
        [("host", "s"), ("lastmod", "s"), ("fetch_date", "s"),
         ("decision", "s")],
    ),
}


def dd_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound dedup bundle: content-hash dedup, sub-document passage
    dedup, crawl-frontier URL canonicalization, the Bloom-prefiltered
    incremental batch dedup, and cluster-blocked semantic dedup
    (SemDeDup) — the standalone dd_* queries melted into one
    oracle-checked frame."""
    from kgforge.operators.relational import _compound

    specs = [
        (sec, QUERIES[sec], flt, keys, cells)
        for sec, (flt, keys, cells) in _DD_CELLS.items()
    ]
    return _compound(spark, sf_dir, specs)


def _dd_compound_sql() -> str:
    from kgforge.operators.relational import _compound_sql

    return _compound_sql(
        [
            (sec, ORACLES[sec], flt, keys, cells)
            for sec, (flt, keys, cells) in _DD_CELLS.items()
        ]
    )


QUERIES = {
    "dd_exact": dd_exact,
    "dd_ngram_jaccard": dd_ngram_jaccard,
    "dd_minhash_lsh": dd_minhash_lsh,
    "dd_simhash": dd_simhash,
    "dd_simhash_verify": dd_simhash_verify,
    "dd_passage": dd_passage,
    "dd_url": dd_url,
    "dd_bloom": dd_bloom,
    "dd_lines": dd_lines,
    "dd_substr": dd_substr,
    "dd_clusters": dd_clusters,
    "dd_snapshots": dd_snapshots,
    "dd_robots": dd_robots,
    "dd_sitemap": dd_sitemap,
}

# SemDeDup lives in similarity.py (it shares the embedding plumbing and
# the deterministic-quantizer recipe) but belongs to the dedup family,
# so it registers and melts here.
from kgforge.operators.similarity import (  # noqa: E402
    ORACLE_DD_SEMDEDUP,
    dd_semdedup,
)

QUERIES["dd_semdedup"] = dd_semdedup

ORACLES = {
    "dd_exact": ORACLE_DD_EXACT,
    "dd_ngram_jaccard": ORACLE_DD_NGRAM_JACCARD,
    "dd_minhash_lsh": ORACLE_DD_MINHASH_LSH,
    # dd_simhash: intentionally no oracle (approximate crc32+splitmix
    # signatures have no SQL equivalent); dd_simhash_verify is the
    # hash-green twin covering the identical pipeline shape
    "dd_simhash_verify": ORACLE_DD_SIMHASH_VERIFY,
    "dd_passage": ORACLE_DD_PASSAGE,
    "dd_url": ORACLE_DD_URL,
    "dd_bloom": ORACLE_DD_BLOOM,
    "dd_lines": ORACLE_DD_LINES,
    "dd_substr": ORACLE_DD_SUBSTR,
    "dd_clusters": ORACLE_DD_CLUSTERS,
    "dd_semdedup": ORACLE_DD_SEMDEDUP,
    "dd_snapshots": ORACLE_DD_SNAPSHOTS,
    "dd_robots": ORACLE_DD_ROBOTS,
    "dd_sitemap": ORACLE_DD_SITEMAP,
}

QUERIES["dd_stats"] = dd_stats
ORACLES["dd_stats"] = _dd_compound_sql()

# the names __spark_entry__ registers (dd_exact / dd_passage / dd_url /
# dd_bloom melt into dd_stats; the standalones remain here for bench,
# tools/verify_local.py --all-rel and pytest)
DRIVER_QUERIES = [
    "dd_ngram_jaccard",
    "dd_minhash_lsh",
    "dd_simhash",
    "dd_simhash_verify",
    "dd_stats",
]
