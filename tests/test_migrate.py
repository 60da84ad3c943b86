"""Schema-migration tests — the alter_pmn_v3_to_v4 analog: additive
nullable columns + rename fixes, declarative, idempotent."""

from kgforge.migrate import TRIPLE_MIGRATIONS, evolve, migrate_triples, table_version


def _v1_table(spark, path):
    df = spark.createDataFrame(
        [("s1", "hasLang", "en", "entity", "u1"),
         ("s2", "hasTopic", "TOPIC:JOIN", "entity", "u2")],
        "subj string, pred string, obj string, quality_kind string, src_url string",
    )
    df.write.mode("overwrite").parquet(path)


def test_migrate_v1_to_v2_adds_renames_and_stamps(spark, tmp_path):
    p = str(tmp_path / "triples")
    _v1_table(spark, p)
    assert table_version(p) == 1
    info = migrate_triples(spark, p)
    assert info["migrated"] and info["version"] == 2
    out = spark.read.parquet(p)
    assert "qual_kind" in out.columns and "quality_kind" not in out.columns
    assert "qual_lang" in out.columns and "src_ts" in out.columns
    assert dict(out.dtypes)["src_ts"] == "timestamp"
    rows = {r["subj"]: r for r in out.collect()}
    assert rows["s1"]["qual_kind"] == "entity"  # renamed data survives
    assert rows["s1"]["qual_lang"] is None      # added column defaults NULL
    assert table_version(p) == 2


def test_migrate_is_idempotent(spark, tmp_path):
    p = str(tmp_path / "triples")
    _v1_table(spark, p)
    migrate_triples(spark, p)
    before = sorted(tuple(r) for r in spark.read.parquet(p).collect())
    info2 = migrate_triples(spark, p)
    assert not info2["migrated"]
    after = sorted(tuple(r) for r in spark.read.parquet(p).collect())
    assert before == after


def test_migrate_preserves_pred_partitioning(spark, tmp_path):
    """A pred-partitioned triple table stays pred-partitioned after
    migration — pred-pruned reads keep partition pruning."""
    import os

    p = str(tmp_path / "triples")
    df = spark.createDataFrame(
        [("s1", "hasLang", "en", "entity", "u1"),
         ("s2", "hasTopic", "TOPIC:JOIN", "entity", "u2")],
        "subj string, pred string, obj string, quality_kind string, src_url string",
    )
    df.write.mode("overwrite").partitionBy("pred").parquet(p)
    assert any(e.startswith("pred=") for e in os.listdir(p))
    info = migrate_triples(spark, p)
    assert info["migrated"]
    assert any(e.startswith("pred=") for e in os.listdir(p))  # layout kept
    out = spark.read.parquet(p)
    assert "pred" in out.columns and "qual_kind" in out.columns
    assert out.count() == 2


def test_evolve_skips_already_applied_steps(spark):
    df = spark.createDataFrame([("s", "p")], "subj string, qual_kind string")
    out = evolve(df, TRIPLE_MIGRATIONS[2])
    # rename target exists already -> skipped; adds applied once
    out2 = evolve(out, TRIPLE_MIGRATIONS[2])
    assert out.columns == out2.columns
