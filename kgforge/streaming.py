"""Streaming surface.

The reference is a batch full-refresh ETL (SURVEY.md §2.9) and the
input_hint is a batch Iceberg table, so streaming is an auxiliary
surface here: the same windowed aggregations exposed batch-first (so
they are oracle-checkable), plus a Structured Streaming runner that
executes the identical logical plan from a stream source — the pytest
parity test asserts stream output == batch output on the same rows.

At production scale the stream source is Kafka/Iceberg-CDC; locally the
parity test drives a parquet directory through readStream with
`processAllAvailable()`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from kgforge.sources import read_table

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _windowed_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type — identical plan for batch
    and stream (watermark added only on the stream path)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(T.DecimalType(18, 4)))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def st_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-first tumbling window aggregation (oracle-checkable; the
    stream parity test runs the same plan through readStream)."""
    return _windowed_agg(read_table(spark, "events", sf_dir)).orderBy(
        "window_start", "event_type"
    )


ORACLE_ST_TUMBLING_AGG = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""


def st_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag(ts) + cumulative sum over gap > 30 min — the
    batch expression of session_window(ts, gap). Per-user session counts
    and mean session length in events."""
    ev = read_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap arithmetic in MICROSECONDS: events carry sub-second timestamps,
    # and cast-to-long truncates in Spark while EPOCH()::BIGINT rounds in
    # DuckDB — a gap straddling 1800s at a fractional second would flip a
    # session boundary between engines. unix_micros is exact on both.
    # (cast: the parquet column is TIMESTAMP_NTZ; session TZ is UTC, so
    # NTZ->TIMESTAMP is value-preserving and unix_micros resolves)
    epoch_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.withColumn(
        "new_session",
        F.when(epoch_us - F.lag(epoch_us).over(w) > 1_800_000_000, 1)
        .otherwise(0)
        .cast("int"),
    )
    sess = gaps.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id")
        .agg(
            (F.max("session_id") + 1).cast("long").alias("n_sessions"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .orderBy("user_id")
    )


ORACLE_ST_SESSIONIZE = """
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id, CAST(MAX(session_id) + 1 AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id ORDER BY user_id
"""


def run_stream_parity(spark: SparkSession, sf_dir: str) -> tuple[list, list]:
    """Drive the windowed agg through Structured Streaming (readStream on
    the events parquet, watermark, memory sink, processAllAvailable) and
    return (stream_rows, batch_rows) for equality assertion."""
    # read the events table specifically — pointing readStream at the
    # whole sf dir unfiltered would silently ingest every sibling table
    # under the events schema as mostly-null rows. The file source wants
    # a directory, so filter by file name.
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = _windowed_agg(stream.withWatermark("ts", "1 hour"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("st_parity_out")
        .start()
    )
    try:
        q.processAllAvailable()
        stream_rows = sorted(
            spark.sql("SELECT * FROM st_parity_out").collect(),
            key=lambda r: (r["window_start"], r["event_type"]),
        )
    finally:
        q.stop()
    batch_rows = st_tumbling_agg(spark, sf_dir).collect()
    return stream_rows, batch_rows


QUERIES = {
    "st_tumbling_agg": st_tumbling_agg,
    "st_sessionize": st_sessionize,
}

ORACLES = {
    "st_tumbling_agg": ORACLE_ST_TUMBLING_AGG,
    "st_sessionize": ORACLE_ST_SESSIONIZE,
}
