"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exact baseline. JVM-side arithmetic via
  zip_with/aggregate in DOUBLE (no Python in the plan); rounded to 9dp
  before ranking so cross-engine float noise cannot flip an order.
- IVF top-k: the scale path — a coarse quantizer partitions vectors
  into cells; queries probe only the nearest cells. At 10^12 vectors
  the candidate set per query is |cell| instead of N. Approximate, so
  no SQL oracle (recall vs brute force is pytest-asserted).
- Embedding-cosine near-dup: all-pairs >= threshold within blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kgforge.sources import read_table

TOP_K = 5


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
    partition layouts."""
    e = read_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cand = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"))
    scored = (
        q.crossJoin(cand)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(_norm_dot(F.col("qv"), F.col("cv")), 9).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "cand_id", "cos")
        .orderBy("query_id", "rnk")
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


def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse cells from a deterministic quantizer (sign
    pattern of the first 3 components — a fixed hyperplane code), query
    probes its own cell plus Hamming-1 neighbors. At scale, cells are
    the shuffle partitioning, so each query touches a small candidate
    set. Approximate — no oracle; pytest measures recall vs brute force."""
    e = read_table(spark, "embeddings", sf_dir)

    def cell_of(col):
        bits = [
            F.when(F.element_at(col, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(3)
        ]
        out = None
        for b in bits:
            out = b if out is None else out + b
        return out

    cells = e.select("vec_id", "embedding", cell_of(F.col("embedding")).alias("cell"))
    q = cells.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"),
        F.col("cell").alias("qcell"),
    )
    # probe set: own cell + 3 Hamming-1 neighbor cells
    probes = q.select(
        "query_id", "qv",
        F.explode(
            F.array(
                F.col("qcell"),
                F.col("qcell").bitwiseXOR(F.lit(1)),
                F.col("qcell").bitwiseXOR(F.lit(2)),
                F.col("qcell").bitwiseXOR(F.lit(4)),
            )
        ).alias("cell"),
    )
    cand = cells.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"), "cell")
    scored = (
        probes.join(cand, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id",
            F.round(_norm_dot(F.col("qv"), F.col("cv")), 9).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "cand_id", "cos")
        .orderBy("query_id", "rnk")
    )


def sim_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.95, a < b).
    Brute-force within the driver scale; the bench path blocks by IVF
    cell first."""
    e = read_table(spark, "embeddings", sf_dir)
    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(_norm_dot(F.col("va"), F.col("vb")), 9).alias("cos"))
        .filter(F.col("cos") >= 0.95)
        .orderBy("a", "b")
    )


ORACLE_SIM_NEARDUP_COSINE = """
WITH scored AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         ROUND(
           list_sum(list_transform(range(1, len(x.embedding)+1),
                    i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(range(1, len(x.embedding)+1),
                    i -> CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, len(y.embedding)+1),
                    i -> CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))))),
         9) AS cos
  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
)
SELECT a, b, cos FROM scored WHERE cos >= 0.95 ORDER BY a, b
"""


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "sim_topk_ivf": sim_topk_ivf,
    "sim_neardup_cosine": sim_neardup_cosine,
}

ORACLES = {
    "sim_topk_bruteforce": ORACLE_SIM_TOPK_BRUTEFORCE,
    # sim_topk_ivf: intentionally no oracle (approximate ANN)
    "sim_neardup_cosine": ORACLE_SIM_NEARDUP_COSINE,
}
