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


def test_alias_budget_guard_blocks_oversized_dictionary(spark):
    """r4 VERDICT item 6: the driver-side alias fetch is budget-guarded.
    An alias set larger than the (explicit) budget raises — hard error,
    never a silent truncation — and the probe stops fetching at
    budget+1 rows instead of collecting the whole frame."""
    import pytest

    from kgforge.ontology import (
        DictionaryBudgetError,
        alias_budget,
        collect_aliases,
    )

    big = spark.range(0, 500, 1, numPartitions=4).select(
        F.concat(F.lit("alias_"), F.col("id").cast("string")).alias("alias")
    )
    with pytest.raises(DictionaryBudgetError) as ei:
        collect_aliases(big, budget=100)
    assert "101" in str(ei.value)  # probe stopped at budget+1, not 500
    # within budget: full distinct list comes back
    got = collect_aliases(big, budget=1000)
    assert len(got) == 500
    # derived budget mirrors local_cc_threshold: positive, clamped
    b = alias_budget(spark)
    assert 500_000 <= b <= 50_000_000


def test_propagate_local_guard(spark):
    """Direct _propagate_local callers hit the same guard instead of an
    unguarded full collect."""
    import pytest

    import kgforge.ontology as O

    big = spark.range(0, O.LOCAL_DICT_THRESHOLD + 10, 1, numPartitions=8).select(
        F.concat(F.lit("\\KG\\X\\"), F.col("id").cast("string")).alias("concept_path"),
        F.col("id").cast("string").alias("alias"),
        F.lit(None).cast("string").alias("canonical_id"),
        F.lit("isA").alias("pred"),
        F.array().cast("array<string>").alias("dim_codes"),
        F.lit(True).alias("is_leaf"),
        F.lit(2).alias("hlevel"),
        F.lit("\\KG\\X").alias("parent_path"),
    )
    with pytest.raises(O.DictionaryBudgetError):
        O._propagate_local(big)
