"""Reconciliation metrics — the i2pReport analog
(Oracle/PCORNetLoader_ora.sql:2451-2565).

The reference appends per-table (runid, name, sourceval, destval, diff)
rows to i2pReport and sites mail the table in as acceptance evidence.
Here: one metrics DataFrame per run with per-stage / per-predicate
counts and distinct-subject counts, written next to the triple output.
Exact counts gate the tests; at 10^12-doc scale the monitoring variant
uses approx_count_distinct (documented at SURVEY.md §2.4).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stage_counts(df: DataFrame, stage: str, subj_col: str | None = None) -> DataFrame:
    aggs = [F.lit(stage).alias("stage"), F.count(F.lit(1)).alias("n_rows")]
    if subj_col:
        aggs.append(F.countDistinct(subj_col).alias("n_subjects"))
    else:
        aggs.append(F.lit(None).cast("long").alias("n_subjects"))
    return df.agg(*aggs)


def triple_report(triples: DataFrame) -> DataFrame:
    """Per-predicate reconciliation: counts, distinct subjects, max
    source timestamp (the data-freshness metric,
    MSSQL/PCORNetLoader.sql:2516-2524).

    This is the run-internal MONITORING report: distinct subjects use
    approx_count_distinct so the pass over the triple table stays one
    map-side-partial aggregation (SURVEY.md §2.4). The oracle-checked
    exact variant is the kg_report query in kgforge.pipeline."""
    return (
        triples.groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.approx_count_distinct("subj").alias("n_subjects"),
            F.max("src_ts").alias("max_src_ts"),
        )
        .orderBy("pred")
    )


def write_metrics(
    metrics: DataFrame, out_dir: str, run_id: str, name: str = "_metrics"
) -> None:
    (
        metrics.withColumn("run_id", F.lit(run_id))
        .withColumn("recorded_at", F.lit(int(time.time())))
        .coalesce(1)
        .write.mode("append")
        .parquet(f"{out_dir}/{name}")
    )


def read_metrics(
    spark: SparkSession, out_dir: str, name: str = "_metrics"
) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/{name}")
