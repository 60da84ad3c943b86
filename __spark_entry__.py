"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: the full KG triple-emission pipeline on sf0.001.
queries()    — one entry per implemented operator from SURVEY.md §2 plus
               the training-data-pipeline operators (dedup / similarity /
               text analysis / multimodal plumbing).
oracle_sql() — DuckDB-equivalent SQL per query (omitted only for
               genuinely non-SQL-expressible ops; driver then records a
               rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline pages -> extract -> mentions -> link ->
    canonicalize -> triples on sf0.001."""
    from kgforge.pipeline import QUERIES as KG_QUERIES

    if "kg_triples" in KG_QUERIES:  # full pipeline (lands with kgforge.pipeline)
        return KG_QUERIES["kg_triples"](spark, "/root/testdata/sf0.001")
    from kgforge.operators.relational import q_pricing_summary

    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgforge.operators import relational
    from kgforge.operators import dedup, similarity, textstats, multimodal, temporal
    from kgforge import pipeline, streaming

    # Priority order: the driver records queries in registration order
    # and may stop early on a budget (round 1 truncated after 50 of 55).
    # Highest-evidence-value first — the flagship kg_* pipeline family,
    # the streaming rows, this round's new operators — so whatever
    # prefix gets recorded carries the most information.
    out: dict[str, Callable] = {}
    out.update(pipeline.QUERIES)  # kg_* flagship (incl. measurements/qualifiers)
    out.update(streaming.QUERIES)
    new_rel = [
        "rel_unit_convert",
        "rel_format_lpad",
        "rel_path_slice",
        "rel_composite_key_scope",
        "rel_loyalty_override",
    ]
    for name in new_rel:
        out[name] = relational.QUERIES[name]
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)
    out.update(textstats.QUERIES)
    out.update(temporal.QUERIES)
    out.update(multimodal.QUERIES)
    out.update(relational.QUERIES)  # remaining §2 inventory
    return out


def oracle_sql() -> dict[str, str]:
    from kgforge.operators import relational
    from kgforge.operators import dedup, similarity, textstats, multimodal, temporal
    from kgforge import pipeline, streaming

    out: dict[str, str] = {}
    out.update(pipeline.ORACLES)
    out.update(relational.ORACLES)
    out.update(dedup.ORACLES)
    out.update(similarity.ORACLES)
    out.update(textstats.ORACLES)
    out.update(multimodal.ORACLES)
    out.update(temporal.ORACLES)
    out.update(streaming.ORACLES)
    return out
