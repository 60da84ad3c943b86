"""Stage 2b — candidate linking: mentions x broadcast concept dictionary.

The reference's central join: observation_fact.concept_cd =
ontology.c_basecode with a path predicate alongside
(Oracle/PCORNetLoader_ora.sql:1499, :1605, :1937, :2198, :2326). At
corpus scale the dictionary is orders of magnitude smaller than the
mention stream, so this is a broadcast hash join — the fact side is
never shuffled.

Scoring (the analog of the reference's implicit preferences): exact
alias match scores 1.0, discounted for folder (non-leaf) targets; the
per-mention winner is picked by window rank with deterministic
tiebreaks, mirroring the dictionary-side dedup at
Oracle/PCORNetLoader_ora.sql:1852-1857.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def winner_dictionary(dictionary: DataFrame) -> DataFrame:
    """The linker's dictionary-side winner set: leaves with resolved
    ids, V/E disambiguation, preference rank -> ONE row per alias
    (surface, concept_path, canonical_id, pred, score). Shared by
    link_mentions and the pattern-relation extractor so both link
    against the identical concept set."""
    dic = dictionary.filter(
        F.col("is_leaf") & F.col("canonical_id").isNotNull()
    ).select(
        F.col("alias").alias("surface"),
        "concept_path",
        "canonical_id",
        "pred",
        "is_leaf",
        "hlevel",
    )
    # regex disambiguation analog (Oracle/PCORNetLoader_ora.sql:1502-1505):
    # drop V/E-style codes misfiled across sibling subtrees unless the path
    # is self-consistent with the code's scheme. Applied DICTIONARY-side.
    dic = dic.filter(
        ~(
            F.col("canonical_id").rlike("^[VE]")
            & ~F.col("concept_path").rlike(r"\\(V|E)CODES?\\")
        )
        | F.col("canonical_id").isNull()
    ).withColumn("score", F.when(F.col("is_leaf"), F.lit(1.0)).otherwise(F.lit(0.8)))
    # Winner-per-alias rank also runs DICTIONARY-side: the preference
    # (score, hlevel, path) depends only on dictionary attributes, so
    # ranking the tiny dictionary is equivalent to ranking per mention —
    # and it makes the linker SHUFFLE-FREE: one broadcast hash join over
    # the mention stream, no window over 10^12 rows. This is the
    # reference's own dedup-before-join rewrite (pcornet_lab2,
    # Oracle/PCORNetLoader_ora.sql:1846-1859; SURVEY.md §4).
    w = Window.partitionBy("surface").orderBy(
        F.desc("score"), F.desc("hlevel"), F.asc("concept_path")
    )
    return (
        dic.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "is_leaf")
    )


def link_mentions(mentions: DataFrame, dictionary: DataFrame) -> DataFrame:
    """mentions x dictionary -> candidates, one winning candidate per
    mention.

    Output: (url, warc_ts, mention_id, surface, kind, value_num,
    value_text, concept_path, canonical_id, pred, score).
    """
    winners = winner_dictionary(dictionary)
    out_cols = [
        "url",
        "warc_ts",
        "mention_id",
        "surface",
        "kind",
        "value_num",
        "value_text",
        "concept_path",
        "canonical_id",
        "pred",
        "score",
    ]
    entity_cands = (
        mentions.filter(F.col("kind") == "entity")
        .join(F.broadcast(winners), "surface", "inner")
        .select(*out_cols)
    )
    # Numeric observations link by construction, not by dictionary alias:
    # the metric NAME is the concept (the pmnVITAL/pmnLAB analog,
    # Oracle/PCORNetLoader_ora.sql:1644-1660, :1901-1929). valtype_cd='N'
    # rows carry their value/comparator through to the measurement
    # emitter rather than being dropped by the alias join.
    numeric_cands = mentions.filter(F.col("kind") == "numeric").select(
        "url",
        "warc_ts",
        "mention_id",
        "surface",
        "kind",
        "value_num",
        "value_text",
        F.lit(None).cast("string").alias("concept_path"),
        F.concat(F.lit("METRIC:"), F.upper("surface")).alias("canonical_id"),
        F.lit("hasMeasurement").alias("pred"),
        F.lit(1.0).alias("score"),
    )
    return entity_cands.unionByName(numeric_cands)


def attach_qualifiers(candidates: DataFrame) -> DataFrame:
    """Qualifier re-attach as ONE groupBy-pivot instead of the
    reference's six stacked left self-joins on a 6-col composite key
    (Oracle/PCORNetLoader_ora.sql:2202-2243).

    Numeric mentions on the same page qualify entity mentions: here the
    page-level pivot collects each page's numeric observations wide, then
    a single broadcast-friendly join re-attaches them.
    """
    numerics = (
        candidates.filter(F.col("kind") == "numeric")
        .groupBy("url")
        .agg(
            F.max("value_num").alias("q_max_value"),
            F.min("value_num").alias("q_min_value"),
            F.count(F.lit(1)).alias("q_n_numeric"),
        )
    )
    entities = candidates.filter(F.col("kind") == "entity")
    return entities.join(numerics, "url", "left")
