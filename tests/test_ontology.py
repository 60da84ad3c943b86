"""Ontology cleanup / propagation / dedup (SURVEY.md §2.5, §2.8)."""

from pyspark.sql import functions as F

from kgforge.ontology import (
    clean_dictionary,
    dedup_by_preference,
    linker_dictionary,
    propagate_hierarchy,
)
from kgforge.pipeline import inline_dictionary


def test_propagation_nearest_ancestor(spark):
    """Leaf without canonical_id inherits from its nearest valued
    ancestor (the PCORI_MEDS recursive-CTE semantics)."""
    dic = propagate_hierarchy(clean_dictionary(inline_dictionary(spark)))
    line = dic.filter(F.col("alias") == "line").collect()
    assert len(line) == 1
    assert line[0]["canonical_id"] == "PLACE:AREA1"


def test_propagation_does_not_clobber_own_values(spark):
    dic = propagate_hierarchy(clean_dictionary(inline_dictionary(spark)))
    join_row = dic.filter(F.col("alias") == "join").collect()[0]
    assert join_row["canonical_id"] == "TOPIC:JOIN"


def test_dedup_preference_keeps_leaf_and_depth(spark):
    """Duplicate alias rows collapse to the deepest leaf (row_number
    over preference order, Oracle/PCORNetLoader_ora.sql:1852)."""
    dic = dedup_by_preference(
        propagate_hierarchy(clean_dictionary(inline_dictionary(spark)))
    )
    q = dic.filter(F.col("alias") == "query").collect()
    assert len(q) == 1
    assert q[0]["canonical_id"] == "TOPIC:QUERY"  # hlevel 3 beats hlevel 2


def test_linker_dictionary_leaves_only(spark):
    dic = linker_dictionary(
        propagate_hierarchy(clean_dictionary(inline_dictionary(spark)))
    )
    rows = dic.collect()
    assert all(r["is_leaf"] for r in rows)
    assert all(r["canonical_id"] is not None for r in rows)
    # folder aliases never reach the linker
    assert not [r for r in rows if r["alias"].startswith("_")]


def test_propagation_distributed_equals_local(spark):
    """The distributed fixpoint loop and the driver-side walk agree —
    same rule, two execution strategies (adaptive cutover)."""
    cleaned = clean_dictionary(inline_dictionary(spark))
    local = sorted(map(tuple, propagate_hierarchy(cleaned).collect()))
    dist = sorted(
        map(tuple, propagate_hierarchy(cleaned, force_distributed=True).collect())
    )
    assert local == dist


def test_synth_dictionary_roundtrip(spark, fixture_dir):
    """The synthetic dirty dictionary survives the full cleanup: every
    surviving linker row has a canonical id, and inherited ids resolve
    to an ancestor's value."""
    raw = spark.read.parquet(f"{fixture_dir}/concept_dict.parquet")
    dic = linker_dictionary(
        dedup_by_preference(propagate_hierarchy(clean_dictionary(raw)))
    )
    rows = dic.collect()
    assert rows
    assert all(r["canonical_id"] for r in rows)
    # one row per alias after preference dedup
    aliases = [r["alias"] for r in rows]
    assert len(aliases) == len(set(aliases))
