"""Temporal operators: as-of joins and friends.

The reference has no range/as-of joins (SURVEY.md §2.3 note), but a
warc_ts-windowed corpus needs them; two Spark-first expressions:

- window form (same-table as-of): last-matching-prior-row via
  last(..., ignorenulls) over an ordered window — one shuffle, no UDF.
- join form (two tables): per-group applyInPandas with pd.merge_asof —
  the Arrow-batched path for genuinely separate left/right relations.
  Groups partition the shuffle, so skewed users are bounded by the
  per-group row count, not the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from kgforge.sources import read_table


def asof_last_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the timestamp of the user's most recent purchase
    at-or-before the click — expressed as one ordered window with
    last(ignorenulls), no join at all."""
    ev = read_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    purchase_ts = F.last(
        F.when(F.col("event_type") == "purchase", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("last_purchase_ts", purchase_ts)
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "last_purchase_ts")
    )


ORACLE_ASOF_WINDOW = """
SELECT event_id, user_id, ts, last_purchase_ts FROM (
  SELECT event_id, user_id, ts, event_type,
         LAST_VALUE(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS last_purchase_ts
  FROM events
) WHERE event_type = 'click' ORDER BY event_id
"""


ASOF_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("matched_event_id", T.LongType()),
        T.StructField("matched_value", T.DoubleType()),
    ]
)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
) -> DataFrame:
    """Generic backward as-of join left<-right via cogrouped
    applyInPandas + pd.merge_asof. Shuffles both sides once on `by`;
    per-group merge is Arrow-batched. (Spark lacks a native as-of join;
    this is pattern (b) of the custom-operator ladder.)"""

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=[f.name for f in ASOF_SCHEMA.fields])
        l = l.sort_values(on)
        if r.empty:
            out = l.copy()
            out["matched_event_id"] = pd.array([None] * len(l), dtype="Int64")
            out["matched_value"] = pd.array([None] * len(l), dtype="float64")
        else:
            r = r.sort_values(on).rename(
                columns={"event_id": "matched_event_id", "value": "matched_value"}
            )
            out = pd.merge_asof(
                l,
                r[[on, "matched_event_id", "matched_value"]],
                on=on,
                direction="backward",
                allow_exact_matches=True,
            )
            out["matched_event_id"] = out["matched_event_id"].astype("Int64")
        return out[["event_id", "user_id", on, "matched_event_id", "matched_value"]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(lambda l, r: merge(l, r), ASOF_SCHEMA)
    )


def asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable as-of join: clicks <- purchases per user."""
    ev = read_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(clicks, purchases)


ORACLE_ASOF_JOIN = """
SELECT c.event_id, c.user_id, c.ts,
       p.event_id AS matched_event_id, p.value AS matched_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN
     (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""


QUERIES = {
    "tp_asof_window": asof_last_event_window,
    "tp_asof_join": asof_click_purchase,
}

ORACLES = {
    "tp_asof_window": ORACLE_ASOF_WINDOW,
    "tp_asof_join": ORACLE_ASOF_JOIN,
}
