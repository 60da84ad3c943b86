"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exact baseline. JVM-side arithmetic via
  zip_with/aggregate in DOUBLE (no Python in the plan); rounded to 9dp
  before ranking so cross-engine float noise cannot flip an order.
- IVF top-k: the scale path — a TRAINED coarse quantizer (spherical
  k-means fit on a deterministic sample, centroids shipped in the UDF
  closure = broadcast) partitions vectors into cells; queries probe the
  nprobe nearest cells, so the per-query candidate set is ~nprobe/K of
  the collection instead of N. Approximate, so no SQL oracle; recall vs
  brute force is pytest-asserted at >= 0.9 on clustered data (the
  regime IVF exists for). On uniform-sphere vectors — the information-
  theoretic worst case, which is what the synthetic embeddings table is
  — measured recall at K=16/nprobe=8 is ~0.86 at sf0.01; no partition
  index beats that without scanning most of the data.
- Embedding-cosine near-dup: hyperplane-LSH banded blocking -> exact
  cosine verification within blocks. No CartesianProduct in the plan
  (pytest asserts); deterministic planted clones give the query real
  positive pairs to find, and the exact all-pairs DuckDB oracle must
  agree on the verified output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from kgforge.sources import read_table

TOP_K = 5

# IVF knobs. K ~ sqrt(N) on a real corpus (re-trained per snapshot);
# nprobe trades recall for candidate-set size.
IVF_K = 16
IVF_NPROBE = 8
IVF_SAMPLE = 2048
IVF_ITERS = 20

# near-dup blocking: 16 bands x 8 hyperplane sign bits (128 hyperplanes).
# Wider keys dominate narrower ones BOTH ways here: vs the previous
# 8x4 config, 16x8 cuts expected candidate pairs ~8x (256 buckets per
# band instead of 16 -> bucket size N/256, pairs ~ N^2/512 per band)
# AND lowers the miss probability: P(miss) for a true pair at
# cos >= 0.95 is (1 - p^8)^16 with p = 1 - arccos(0.95)/pi ~ 0.899
# -> ~1.4e-4 (was ~2.1e-4); for the planted clones at cos ~ 0.999 it
# is ~3e-16. At larger N, bits scales as ~log2(N / target bucket) —
# the knob that keeps block sizes flat as the corpus grows.
ND_BANDS = 16
ND_BITS = 8
NEARDUP_T = 0.95


def _norm_dot(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: query vectors (vec_id % 50 == 0) against the
    full collection. Rank by (cos rounded 9dp DESC, vec_id ASC) — the
    deterministic tiebreak keeps the result stable across engines and
    partition layouts.

    Shape (r06): the old plan was a BroadcastNestedLoopJoin of |Q| x N
    pairs, each paying THREE interpreted higher-order array folds (dot
    + both norms re-derived per pair) — 172s at sf1.0, quadratic in
    interpreted JVM work. Now the query batch is collected driver-side
    (metadata-scale by definition of a query batch — the same contract
    as pq_topk's LUT build) and the collection is scanned once with
    mapInPandas: one numpy matmul scores a whole Arrow batch against
    every query, and each batch emits only its top-k candidates per
    query. The per-batch cut keeps cos UNROUNDED and a 2e-9 safety
    margin below the k-th best, so the final JVM F.round(...,9) +
    row_number window — unchanged from the old plan — sees every row
    that could make the global rounded top-k: x > y + 2e-9 implies
    round(x) > round(y), hence a row cut by the margin loses to >= k
    rows under the rounded ordering too, regardless of tiebreaks. The
    scan shuffles nothing but the per-batch winners (~|Q| * k rows per
    partition); the collection is never joined or broadcast."""
    e = read_table(spark, "embeddings", sf_dir)
    qrows = (
        e.filter(F.col("vec_id") % 50 == 0)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    if len(Q):
        nq = np.sqrt((Q * Q).sum(axis=1))

    scan_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("cand_id", T.LongType()),
            T.StructField("cos_raw", T.DoubleType()),
        ]
    )
    top_k = TOP_K

    def scan(batches):
        for pdf in batches:
            if not len(pdf) or not len(Q):
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            nc = np.sqrt((X * X).sum(axis=1))
            cos = (Q @ X.T) / (nq[:, None] * nc[None, :])
            not_self = ids[None, :] != qids[:, None]
            sel = np.where(not_self & ~np.isnan(cos), cos, -np.inf)
            t = min(top_k, sel.shape[1])
            kth = np.partition(sel, sel.shape[1] - t, axis=1)[:, sel.shape[1] - t]
            mask = not_self & ((sel >= (kth[:, None] - 2e-9)) | np.isnan(cos))
            qi, ci = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "query_id": qids[qi],
                    "cand_id": ids[ci],
                    "cos_raw": cos[qi, ci],
                }
            )

    # the local fixture is one parquet split; hash-repartition by id so
    # the matmul scan uses every core (a 100-TB table arrives as
    # thousands of splits and skips this)
    part = (
        e.select("vec_id", "embedding")
        .repartition(spark.sparkContext.defaultParallelism, F.col("vec_id"))
        .mapInPandas(scan, scan_schema)
    )
    scored = part.filter(F.col("query_id") != F.col("cand_id")).select(
        "query_id", "cand_id", F.round(F.col("cos_raw"), 9).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "cand_id", "cos")
    )


ORACLE_SIM_TOPK_BRUTEFORCE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0
),
scored AS (
  SELECT q.query_id, e.vec_id AS cand_id,
         ROUND(
           list_sum(list_transform(range(1, len(qv)+1),
                    i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(range(1, len(qv)+1),
                    i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))),
         9) AS cos
  FROM q CROSS JOIN embeddings e WHERE q.query_id <> e.vec_id
)
SELECT query_id, rnk, cand_id, cos FROM (
  SELECT query_id, cand_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 5 ORDER BY query_id, rnk
"""


# ---------------------------------------------------------------------------
# IVF: trained coarse quantizer + multi-probe
# ---------------------------------------------------------------------------

def spherical_kmeans(X: np.ndarray, k: int, iters: int = IVF_ITERS, seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means on a sample (driver-side numpy —
    the sample is metadata-scale; on a real corpus this runs on a
    TABLESAMPLE). Returns unit-norm centroids (k', d), k' <= k."""
    rng = np.random.RandomState(seed)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(k, len(Xn))
    C = Xn[rng.choice(len(Xn), k, replace=False)].copy()
    for _ in range(iters):
        a = np.argmax(Xn @ C.T, axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                c = Xn[m].mean(axis=0)
                n = np.linalg.norm(c)
                if n > 1e-12:
                    C[j] = c / n
    return C


def train_centroids(
    e: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
    k: int = IVF_K, sample_n: int = IVF_SAMPLE, seed: int = 42,
) -> np.ndarray:
    """One deterministic sample pass (orderBy+limit locally; TABLESAMPLE
    on a real corpus) -> k-means fit. The centroid matrix is tiny
    (k x d doubles) and ships to executors in the UDF closure —
    broadcast by construction."""
    rows = e.orderBy(id_col).limit(sample_n).select(vec_col).collect()
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    return spherical_kmeans(X, k, seed=seed)


def make_cell_udfs(C: np.ndarray, nprobe: int):
    """(assign, probes): Arrow-batched cell assignment (argmax cosine vs
    centroids — one numpy matmul per batch, no per-row Python) and the
    nprobe nearest cells for the query side."""
    Ct = C.T.copy()

    @pandas_udf(T.IntegerType())
    def assign(emb: pd.Series) -> pd.Series:
        X = np.array(emb.tolist(), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(X @ Ct, axis=1).astype(np.int32))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(emb: pd.Series) -> pd.Series:
        X = np.array(emb.tolist(), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(X @ Ct), axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(order.tolist())

    return assign, probes


def ivf_topk(
    e: DataFrame, query_pred, k_cells: int = IVF_K, nprobe: int = IVF_NPROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """IVF ANN: assign every vector to its nearest trained centroid,
    probe each query's nprobe nearest cells, exact-rank the candidates.
    The cell is the shuffle key, so each query's work is the probed
    cells' contents (~nprobe/K of the collection), never all-pairs."""
    C = train_centroids(e, k=k_cells)
    assign, probes = make_cell_udfs(C, nprobe)
    cells = e.select("vec_id", "embedding", assign("embedding").alias("cell"))
    q = cells.filter(query_pred(F.col("vec_id"))).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.explode(probes(F.col("embedding"))).alias("cell"),
    )
    cand = cells.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"), "cell"
    )
    scored = (
        q.join(cand, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id",
            F.round(_norm_dot(F.col("qv"), F.col("cv")), 9).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("query_id", "rnk", "cand_id", "cos")
    )


def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable IVF top-k over the embeddings table (rows-only
    check: approximate op)."""
    e = read_table(spark, "embeddings", sf_dir)
    return ivf_topk(e, lambda vid: vid % 50 == 0)


# ---------------------------------------------------------------------------
# Near-dup cosine: LSH-blocked, exact-verified
# ---------------------------------------------------------------------------

def make_band_key_udf(n_bands: int = ND_BANDS, bits: int = ND_BITS, seed: int = 7):
    """Arrow-batched hyperplane signature: n_bands keys per vector, each
    packing `bits` sign bits with the band id in the high word. The
    hyperplane matrix depends only on (seed, dim) — identical on every
    executor."""
    state = {}

    @pandas_udf(T.ArrayType(T.LongType()))
    def band_keys(v: pd.Series) -> pd.Series:
        X = np.array(v.tolist(), dtype=np.float64)
        H = state.get("H")
        if H is None or H.shape[1] != X.shape[1]:
            H = np.random.RandomState(seed).randn(n_bands * bits, X.shape[1])
            state["H"] = H
        B = (X @ H.T >= 0).astype(np.int64)  # (n, n_bands*bits)
        out = np.zeros((len(X), n_bands), dtype=np.int64)
        for b in range(n_bands):
            key = np.zeros(len(X), dtype=np.int64)
            for j in range(bits):
                key = (key << 1) | B[:, b * bits + j]
            out[:, b] = (np.int64(b) << 32) | key
        return pd.Series(out.tolist())

    return band_keys


def _neardup_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings + deterministic near-clones (vec_id % 25 == 0 re-keyed
    at +100000, first component shifted by +0.05) so the near-dup
    operator has real positive pairs (cos ~ 0.999) — the same planted-
    duplicate discipline as dd_exact."""
    e = read_table(spark, "embeddings", sf_dir)
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    base = e.select("vec_id", as_double.alias("v"))
    clones = e.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x.cast("double") + F.lit(0.05)).otherwise(
                x.cast("double")
            ),
        ).alias("v"),
    )
    return base.unionByName(clones)


def sim_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.95, a < b):
    hyperplane-LSH banded blocking turns all-pairs into equi-joins on
    32-bit band keys, then exact cosine verifies within blocks —
    MinHash-LSH's propose/verify discipline applied to vectors. No
    CartesianProduct anywhere in the plan.

    Shape (r06): on uniform vectors the band buckets propose ~N^2/512
    random pairs per band (13M at sf1.0), and the old plan shuffled
    every one of them through a distinct and two vector-attach joins,
    then paid an interpreted array fold per pair — 73s at sf1.0. Now
    each band bucket is scored IN PLACE: one numpy matmul per bucket
    (applyInPandas over the band key) emits only pairs whose in-bucket
    cosine clears the threshold minus a 1e-6 margin, so the candidate
    stream that leaves the bucket stage is metadata-sized (~planted
    clones + margin hits, not N^2/512). The surviving pairs are then
    verified by the UNCHANGED exact JVM formula (zip_with dot over
    once-computed norms, rounded 9dp) — in-bucket numpy cos differs
    from the JVM fold by ~1e-13 << the margin, so no true pair can be
    cut and the emitted rows are bit-identical to the old plan's.
    Vectors move once per band as part of the bucket shuffle; no
    per-pair vector attach ever happens for non-candidates."""
    vecs = _neardup_vectors(spark, sf_dir).cache()  # banded stage + verify join
    band_keys = make_band_key_udf()
    banded = vecs.select(
        "vec_id", "v", F.explode(band_keys("v")).alias("bk")
    )

    cand_schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.LongType())]
    )
    thr = NEARDUP_T - 1e-6

    def bucket_candidates(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"a": [], "b": []}).astype("int64")
        V = np.array(pdf["v"].tolist(), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        nrm = np.sqrt((V * V).sum(axis=1))
        nrm[nrm == 0.0] = 1.0
        C = (V / nrm[:, None]) @ (V / nrm[:, None]).T
        iu, ju = np.triu_indices(n, k=1)
        c = C[iu, ju]
        m = (c >= thr) | np.isnan(c)
        pa, pb = ids[iu[m]], ids[ju[m]]
        return pd.DataFrame(
            {"a": np.minimum(pa, pb), "b": np.maximum(pa, pb)}
        )

    pairs = (
        banded.groupBy("bk")
        .applyInPandas(bucket_candidates, cand_schema)
        .distinct()
    )
    # norms computed ONCE per vector, not per pair — verification then
    # evaluates one dot product per pair instead of three array folds
    withn = vecs.select(
        "vec_id",
        "v",
        F.sqrt(
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("nrm"),
    )
    va = withn.select(
        F.col("vec_id").alias("a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    vb = withn.select(
        F.col("vec_id").alias("b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        pairs.join(va, "a")
        .join(vb, "b")
        .select(
            "a", "b", F.round(dot / (F.col("na") * F.col("nb")), 9).alias("cos")
        )
        .filter(F.col("cos") >= NEARDUP_T)
    )


ORACLE_SIM_NEARDUP_COSINE = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_concat([CAST(embedding[1] AS DOUBLE) + 0.05],
                     list_transform(embedding[2:], x -> CAST(x AS DOUBLE)))
  FROM embeddings WHERE vec_id % 25 = 0
),
scored AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         ROUND(
           list_sum(list_transform(range(1, len(x.v)+1), i -> x.v[i] * y.v[i]))
           / (sqrt(list_sum(list_transform(range(1, len(x.v)+1), i -> x.v[i] * x.v[i])))
            * sqrt(list_sum(list_transform(range(1, len(y.v)+1), i -> y.v[i] * y.v[i])))),
         9) AS cos
  FROM base x JOIN base y ON x.vec_id < y.vec_id
)
SELECT a, b, cos FROM scored WHERE cos >= 0.95 ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# IVF re-rank with an exact oracle (axis-aligned coarse quantizer)
# ---------------------------------------------------------------------------

RERANK_CELLS = 16
RERANK_NPROBE = 8


def sim_ivf_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-EXACT IVF twin: the identical probe -> cell-equi-join ->
    bounded-candidate -> exact re-rank plan as sim_topk_ivf, with the
    trained k-means quantizer swapped for a deterministic SQL-expressible
    one (cell = argmax component among the first 16 dims — axis-aligned
    centroids; queries probe their top-8 components' cells). Closes the
    round-3 gap where IVF's final-stage exact re-ranking had no
    hash-green driver row: here every stage, including candidate
    generation, is independently recomputed by DuckDB and the top-k must
    match cell-for-cell. The trained quantizer stays in sim_topk_ivf as
    the recall path (pytest >= 0.9 on clustered data); this query proves
    the re-rank machinery (window over bounded candidates, 9dp-rounded
    cosine, deterministic tiebreak) exact at any scale."""
    e = read_table(spark, "embeddings", sf_dir)
    v = e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    pos = v.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(RERANK_CELLS - 1))).alias("i"),
        "v",
    ).select("vec_id", "i", F.element_at("v", F.col("i") + 1).alias("val"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("val"), F.asc("i"))
    ranked = pos.withColumn("rn", F.row_number().over(w))
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", F.col("i").alias("cell"))
    probes = ranked.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("rn") <= RERANK_NPROBE)
    ).select(F.col("vec_id").alias("query_id"), F.col("i").alias("cell"))
    cand = v.join(assign, "vec_id").select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"), "cell"
    )
    q = (
        v.filter(F.col("vec_id") % 50 == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        .join(probes, "query_id")
    )
    scored = (
        q.join(cand, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(_norm_dot(F.col("qv"), F.col("cv")), 9).alias("cos"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "cand_id", "cos")
    )


ORACLE_SIM_IVF_RERANK = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), pos AS (
  SELECT vec_id, i, v[(i+1)::INT] AS val
  FROM v CROSS JOIN range(0,{RERANK_CELLS}) t(i)
), ranked AS (
  SELECT vec_id, i,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY val DESC, i ASC) AS rn
  FROM pos
), assign AS (
  SELECT vec_id, i AS cell FROM ranked WHERE rn = 1
), probes AS (
  SELECT vec_id AS query_id, i AS cell FROM ranked
  WHERE rn <= {RERANK_NPROBE} AND vec_id % 50 = 0
), cand AS (
  SELECT a.vec_id AS cand_id, v.v AS cv, a.cell
  FROM assign a JOIN v ON v.vec_id = a.vec_id
), q AS (
  SELECT p.query_id, v.v AS qv, p.cell
  FROM probes p JOIN v ON v.vec_id = p.query_id
), scored AS (
  SELECT query_id, cand_id,
         ROUND(
           list_sum(list_transform(range(1, len(qv)+1), i -> qv[i] * cv[i]))
           / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i] * qv[i])))
            * sqrt(list_sum(list_transform(range(1, len(cv)+1), i -> cv[i] * cv[i])))),
         9) AS cos
  FROM q JOIN cand USING (cell) WHERE query_id <> cand_id
)
SELECT query_id, rnk, cand_id, cos FROM (
  SELECT query_id, cand_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K} ORDER BY query_id, rnk
"""


# ---------------------------------------------------------------------------
# SemDeDup: cluster-blocked semantic deduplication (embedding space)
# ---------------------------------------------------------------------------

SEM_CELLS = 16  # quantizer cells; SemDeDup's K — THE 100-TB scale knob
SEM_CAP = 96  # per-cell member cap (hash-ranked, deterministic)
SEM_TAU = 0.95  # within-cluster cosine above which docs are semantic dups
SEM_A = 2654435761  # Knuth multiplicative hash for the cap ranking
SEM_MOD = 1 << 32


def dd_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    embedding space, compute pairwise cosine only WITHIN clusters, and
    mark any document whose similarity to an earlier cluster-mate
    exceeds tau as a semantic duplicate — the method that removed ~50%
    of LAION while improving downstream accuracy. Emits one row per
    dropped doc: its keeper (lowest-id neighbor above tau), the cosine
    to that keeper, how many neighbors exceeded tau, and the cell.

    Oracle-exact by the sim_ivf_rerank recipe: the k-means clusterer is
    swapped for the deterministic axis-argmax quantizer (cell = argmax
    component among the first SEM_CELLS dims) so DuckDB recomputes
    assignment, cap, pairs, and cosines bit-identically (cosine rounded
    to 9dp before any comparison). Positives are guaranteed at every sf
    by _neardup_vectors' planted clones (cos ~ 0.999) — never vacuous.

    100-TB shape: the all-pairs blowup is bounded twice — cells make
    the join an equi-join on the cell key (SemDeDup scales K with the
    corpus so clusters stay ~constant-sized), and a deterministic
    hash-ranked per-cell cap (fires at sf0.1: ~130 members/cell > 96)
    bounds the worst cell; the cap ranks by multiplicative hash, not by
    id, so planted/late ids are not systematically evicted. Norms are
    computed once per member, not per pair; the pair stage shuffles
    only (cell, id, vec)."""
    vecs = _neardup_vectors(spark, sf_dir)
    pos = vecs.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(SEM_CELLS - 1))).alias("i"),
        "v",
    ).select("vec_id", "i", F.element_at("v", F.col("i") + 1).alias("val"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("val"), F.asc("i"))
    assign = (
        pos.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("i").alias("cell"))
    )
    hr = (F.col("vec_id") * SEM_A) % SEM_MOD
    wc = Window.partitionBy("cell").orderBy(hr.asc(), F.col("vec_id").asc())
    members = (
        vecs.join(assign, "vec_id")
        .withColumn("crn", F.row_number().over(wc))
        .filter(F.col("crn") <= SEM_CAP)
        .select(
            "cell",
            "vec_id",
            "v",
            F.sqrt(
                F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
            ).alias("nrm"),
        )
    )
    a = members.select(
        "cell", F.col("vec_id").alias("a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = members.select(
        "cell", F.col("vec_id").alias("b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("a") < F.col("b"))
        .select(
            "cell", "a", "b",
            F.round(dot / (F.col("na") * F.col("nb")), 9).alias("cos"),
        )
        .filter(F.col("cos") >= SEM_TAU)
    )
    return (
        pairs.groupBy("b", "cell")
        .agg(
            F.min("a").cast("long").alias("keeper_id"),
            F.min_by("cos", "a").alias("cos_keeper"),
            F.count(F.lit(1)).cast("long").alias("n_above"),
        )
        .select(
            F.col("b").cast("long").alias("dup_id"),
            "keeper_id",
            "cos_keeper",
            "n_above",
            F.col("cell").cast("int").alias("cell"),
        )
    )


ORACLE_DD_SEMDEDUP = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_concat([CAST(embedding[1] AS DOUBLE) + 0.05],
                     list_transform(embedding[2:], x -> CAST(x AS DOUBLE)))
  FROM embeddings WHERE vec_id % 25 = 0
), pos AS (
  SELECT vec_id, i, v[(i+1)::INT] AS val
  FROM base CROSS JOIN range(0,{SEM_CELLS}) t(i)
), assign AS (
  SELECT vec_id, i AS cell FROM (
    SELECT vec_id, i,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY val DESC, i ASC) AS rn
    FROM pos) WHERE rn = 1
), members AS (
  SELECT cell, vec_id, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM (
    SELECT a.cell, b.vec_id, b.v,
           ROW_NUMBER() OVER (PARTITION BY a.cell
             ORDER BY (b.vec_id * {SEM_A}) % {SEM_MOD} ASC, b.vec_id ASC) AS crn
    FROM assign a JOIN base b ON b.vec_id = a.vec_id)
  WHERE crn <= {SEM_CAP}
), pairs AS (
  SELECT x.cell, x.vec_id AS a, y.vec_id AS b,
         ROUND(
           list_sum(list_transform(range(1, len(x.v)+1), i -> x.v[i] * y.v[i]))
           / (x.nrm * y.nrm), 9) AS cos
  FROM members x JOIN members y ON x.cell = y.cell AND x.vec_id < y.vec_id
)
SELECT CAST(b AS BIGINT) AS dup_id,
       CAST(min(a) AS BIGINT) AS keeper_id,
       arg_min(cos, a) AS cos_keeper,
       CAST(count(*) AS BIGINT) AS n_above,
       CAST(cell AS INT) AS cell
FROM pairs WHERE cos >= {SEM_TAU}
GROUP BY b, cell ORDER BY dup_id
"""


# ---------------------------------------------------------------------------
# PQ: product quantization + asymmetric-distance shortlist + exact re-rank
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces: 64-dim -> 8 dims each
PQ_KS = 16  # codes per sub-codebook -> 8 x 4 bits = 8 bytes/vector (32x vs fp32)
PQ_SAMPLE = 2048
PQ_ITERS = 20
# ADC shortlist per query before the exact re-rank. Sized for the
# uniform-sphere worst case (measured recall@5 on the synthetic table:
# 48 -> 0.68, 64 -> 0.76, 96 -> 0.86, 128 -> 0.92); on clustered
# embeddings — the regime PQ exists for — 48 already clears 0.9. On a
# real corpus this scales with the tolerated candidate fraction, not N.
PQ_SHORTLIST = 96


def train_pq_codebooks(
    e: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
    m: int = PQ_M, ks: int = PQ_KS, sample_n: int = PQ_SAMPLE, seed: int = 43,
) -> np.ndarray:
    """Per-subspace L2 k-means codebooks, (m, ks, d/m), fit on the same
    deterministic driver-side sample discipline as train_centroids (a
    TABLESAMPLE on a real corpus; the codebooks are m*ks*(d/m) doubles =
    one vector's worth of floats per code, broadcast by closure)."""
    rows = e.orderBy(id_col).limit(sample_n).select(vec_col).collect()
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    ds = X.shape[1] // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, ks, ds))
    for j in range(m):
        S = X[:, j * ds : (j + 1) * ds]
        C = S[rng.choice(len(S), min(ks, len(S)), replace=False)].copy()
        for _ in range(PQ_ITERS):
            d2 = -2.0 * (S @ C.T) + (C * C).sum(axis=1)[None, :]
            a = np.argmin(d2, axis=1)
            for c in range(len(C)):
                msk = a == c
                if msk.any():
                    C[c] = S[msk].mean(axis=0)
        books[j, : len(C)] = C
        if len(C) < ks:  # degenerate sample: repeat the last centroid
            books[j, len(C) :] = C[-1]
    return books


def make_pq_encode_udf(books: np.ndarray):
    """Arrow-batched PQ encoder: per subspace, one matmul argmin against
    the sub-codebook; emits m small int codes per vector — the 8-byte
    representation that replaces the 256-byte fp32 vector in every
    downstream shuffle and scan."""
    m, ks, ds = books.shape
    sq = (books * books).sum(axis=2)  # (m, ks)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(emb: pd.Series) -> pd.Series:
        X = np.array(emb.tolist(), dtype=np.float64)
        codes = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            S = X[:, j * ds : (j + 1) * ds]
            d2 = -2.0 * (S @ books[j].T) + sq[j][None, :]
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(codes.tolist())

    return encode


def pq_topk(
    e: DataFrame, query_pred, shortlist: int = PQ_SHORTLIST, top_k: int = TOP_K
) -> DataFrame:
    """PQ ANN: encode the collection to m-byte codes, scan the codes
    with per-query asymmetric-distance lookup tables (LUT[j][code] =
    dot(query_subvector, sub-centroid), so approx_dot = sum of m table
    lookups — no float vector is touched during the scan), shortlist
    per query, then exact-cosine re-rank only the shortlist.

    100-TB shape: the scan is mapInPandas over the CODES column only
    (8 bytes/vector instead of 256 — the scan reads 3% of the bytes a
    brute-force pass reads), each task emits at most shortlist rows per
    query (per-partition top-t is a superset-safe distributive top-k,
    tie-broken by (adc desc, cand_id) so the shortlist is partition-
    invariant), the global shortlist window sees tasks*shortlist rows,
    and the exact re-rank joins vectors for shortlist*|Q| candidates
    via an equi-join with the tiny query side broadcast. Queries are
    collected driver-side to build LUTs — metadata-scale by definition
    of a query batch (|Q| * m * ks doubles)."""
    books = train_pq_codebooks(e)
    m, ks, ds = books.shape
    encode = make_pq_encode_udf(books)
    # fan the one-split local fixture across cores before the encode +
    # ADC scan (r06; a 100-TB table arrives as thousands of splits)
    codes = e.repartition(
        e.sparkSession.sparkContext.defaultParallelism, "vec_id"
    ).select("vec_id", encode("embedding").alias("code"))
    qrows = (
        e.filter(query_pred(F.col("vec_id")))
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    lut = np.stack(
        [Q[:, j * ds : (j + 1) * ds] @ books[j].T for j in range(m)], axis=1
    )  # (|Q|, m, ks)

    scan_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("cand_id", T.LongType()),
            T.StructField("adc", T.DoubleType()),
        ]
    )

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Cd = np.array(pdf["code"].tolist(), dtype=np.int64)  # (B, m)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            A = lut[:, 0, :][:, Cd[:, 0]]
            for j in range(1, m):
                A = A + lut[:, j, :][:, Cd[:, j]]
            t = min(shortlist, A.shape[1])
            # deterministic per-partition top-t: (-adc, cand_id) lexsort
            order = np.lexsort((np.broadcast_to(ids, A.shape), -A), axis=1)[:, :t]
            out_q = np.repeat(qids, t)
            out_c = ids[order].ravel()
            out_a = np.take_along_axis(A, order, axis=1).ravel()
            yield pd.DataFrame({"query_id": out_q, "cand_id": out_c, "adc": out_a})

    part = codes.mapInPandas(scan, scan_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("cand_id"))
    short = (
        part.filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "cand_id")
    )
    cv = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"))
    qv = e.filter(query_pred(F.col("vec_id"))).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        short.join(cv, "cand_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(_norm_dot(F.col("qv"), F.col("cv")), 9).alias("cos"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= top_k)
        .select("query_id", "rnk", "cand_id", "cos")
    )


def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN over the embeddings table (approximate — recall vs the
    brute-force oracle is pytest-gated, like sim_topk_ivf; bench/
    verify-local surface, not in the capped driver registry)."""
    e = read_table(spark, "embeddings", sf_dir)
    return pq_topk(e, lambda vid: vid % 50 == 0)


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "sim_topk_ivf": sim_topk_ivf,
    "sim_ivf_rerank": sim_ivf_rerank,
    "sim_neardup_cosine": sim_neardup_cosine,
    "sim_topk_pq": sim_topk_pq,
    "dd_semdedup": dd_semdedup,
}

# the names __spark_entry__ registers (the driver caps CORRECTNESS at
# ~50 rows; sim_topk_pq stays bench/pytest-only — approximate op whose
# recall gate lives in the suite, same rationale as dd_simhash's twin)
DRIVER_QUERIES = [
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "sim_ivf_rerank",
    "sim_neardup_cosine",
]

ORACLES = {
    "sim_topk_bruteforce": ORACLE_SIM_TOPK_BRUTEFORCE,
    # sim_topk_ivf: intentionally no oracle (trained quantizer = approx
    # ANN); sim_ivf_rerank is the hash-green twin of the same plan shape
    "sim_ivf_rerank": ORACLE_SIM_IVF_RERANK,
    "sim_neardup_cosine": ORACLE_SIM_NEARDUP_COSINE,
    "dd_semdedup": ORACLE_DD_SEMDEDUP,
}
