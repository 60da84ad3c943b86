"""Stage 4 — triple emitters: linked candidates -> (subj, pred, obj).

Each emitter mirrors one of the reference's 13 PCORNetXxx procedures
(filter -> join -> normalize -> NI-defaults -> project; e.g. diagnosis at
Oracle/PCORNetLoader_ora.sql:1440-1520). A triple row is a reified
assertion about a subject with qualifier codes and RAW_* provenance
(the paired RAW columns of :396-401 become the `raw` struct).

Determinism: triple ids are xxhash64(subj, pred, obj, src_url) —
partition-layout independent, so resume and the N-vs-4N parity test see
identical outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.conf import NI

TRIPLE_COLS = [
    "triple_id",
    "subj",
    "pred",
    "obj",
    "qual_kind",
    "qual_comparator",
    "qual_value_num",
    "qual_lang",
    "raw_surface",
    "src_url",
    "src_ts",
]


def emit_entity_triples(candidates: DataFrame, mapping: DataFrame) -> DataFrame:
    """hasConcept triples: canonical page subject -> linked concept.

    The demographic-emitter analog (Oracle/PCORNetLoader_ora.sql:1103-1246):
    the 7-way mapped/not-mapped UNION collapses into coalesce/when chains.
    """
    c = candidates.join(mapping, "url", "left").withColumn(
        "subj", F.coalesce("canon_url", F.col("url"))
    )
    return c.select(
        F.xxhash64(
            F.col("subj"), F.col("pred"), F.col("canonical_id"), F.col("url")
        ).alias("triple_id"),
        "subj",
        F.coalesce("pred", F.lit("hasConcept")).alias("pred"),
        F.coalesce("canonical_id", F.lit(NI)).alias("obj"),
        F.coalesce("kind", F.lit(NI)).alias("qual_kind"),
        F.coalesce("value_text", F.lit(NI)).alias("qual_comparator"),
        F.col("value_num").alias("qual_value_num"),
        F.lit(None).cast("string").alias("qual_lang"),
        F.col("surface").alias("raw_surface"),
        F.col("url").alias("src_url"),
        F.col("warc_ts").alias("src_ts"),
    )


def emit_page_triples(pages: DataFrame, mapping: DataFrame) -> DataFrame:
    """Per-page structural triples (lang, crawl ts) — the encounter-table
    analog: every downstream emitter scopes to these subjects
    (Oracle/PCORNetLoader_ora.sql:1445)."""
    p = pages.join(mapping, "url", "left").withColumn(
        "subj", F.coalesce("canon_url", F.col("url"))
    )
    return p.select(
        F.xxhash64(F.col("subj"), F.lit("hasLang"), F.col("lang"), F.col("url")).alias(
            "triple_id"
        ),
        "subj",
        F.lit("hasLang").alias("pred"),
        F.coalesce("lang", F.lit(NI)).alias("obj"),
        F.lit("page").alias("qual_kind"),
        F.lit(NI).alias("qual_comparator"),
        F.lit(None).cast("double").alias("qual_value_num"),
        F.col("lang").alias("qual_lang"),
        F.lit(None).cast("string").alias("raw_surface"),
        F.col("url").alias("src_url"),
        F.col("warc_ts").alias("src_ts"),
    )


def emit_sameas_triples(mapping: DataFrame) -> DataFrame:
    """sameAs triples for non-trivial canonicalization results — the
    provider-union analog (distinct ids from prior outputs,
    Oracle/PCORNetLoader_ora.sql:2419-2436)."""
    m = mapping.filter(F.col("url") != F.col("canon_url"))
    return m.select(
        F.xxhash64(F.col("url"), F.lit("sameAs"), F.col("canon_url")).alias("triple_id"),
        F.col("url").alias("subj"),
        F.lit("sameAs").alias("pred"),
        F.col("canon_url").alias("obj"),
        F.lit("canon").alias("qual_kind"),
        F.lit(NI).alias("qual_comparator"),
        F.lit(None).cast("double").alias("qual_value_num"),
        F.lit(None).cast("string").alias("qual_lang"),
        F.lit(None).cast("string").alias("raw_surface"),
        F.col("url").alias("src_url"),
        F.lit(None).cast("timestamp").alias("src_ts"),
    )


def all_triples(
    pages: DataFrame, candidates: DataFrame, mapping: DataFrame
) -> DataFrame:
    """Union of all emitters in dependency order (the pcornetloader DAG,
    Oracle/PCORNetLoader_ora.sql:2600-2618): page triples (encounter
    analog) first, then entity triples, then sameAs links."""
    return (
        emit_page_triples(pages, mapping)
        .unionByName(emit_entity_triples(candidates, mapping))
        .unionByName(emit_sameas_triples(mapping))
    )
