"""SQL-runner whitelist tests — the reference's only executable tests
were doctests on exactly this machinery (query.py:24-77); mirrored here
as doctests + pytest."""

import doctest

import pytest

import kgforge.sqlrunner as sq


def test_doctests():
    results = doctest.testmod(sq)
    assert results.failed == 0, f"{results.failed} doctest failures"


@pytest.mark.parametrize(
    "bad",
    [
        "delete from orders",
        "insert into t values (1)",
        "truncate table orders",
        "drop table orders",
        "create table t as select 1",
        "merge into t using s on 1=1",
        "update t set x = 1",
        "select 1; drop table orders",
        "with x as (select 1) insert into t select * from x",
        "set spark.sql.shuffle.partitions=1",
    ],
)
def test_illegal_statements_rejected(bad):
    with pytest.raises(ValueError):
        for stmt in sq.split_statements(bad):
            sq.check_statement(stmt)


@pytest.mark.parametrize(
    "ok",
    [
        "select * from orders",
        "with t as (select 1 as x) select x from t",
        "select 'delete' as word",  # illegal word inside a string literal
        "explain select 1",
        "select 1 -- drop table orders",
    ],
)
def test_legal_statements_accepted(ok):
    for stmt in sq.split_statements(ok):
        sq.check_statement(stmt)


def test_run_validation_corpus(spark, sf01):
    """Run a mini descriptive-statistics corpus (the ETL_dict_queries
    analog) end-to-end through the guarded runner."""
    sq.register_views(spark, sf01)
    corpus = """
    -- Demographics.Sex-style breakdown
    SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus;
    -- freshness
    SELECT MAX(ts) AS max_ts FROM events;
    """
    out = sq.run_queries(spark, corpus)
    assert len(out) == 2
    assert {r["o_orderstatus"] for r in out[0]["rows"]} == {"F", "O", "P"}
    assert out[1]["rows"][0]["max_ts"] is not None


def test_write_attempt_never_reaches_engine(spark, sf01):
    sq.register_views(spark, sf01)
    with pytest.raises(ValueError, match="Illegal token"):
        sq.run_queries(spark, "SELECT 1; DELETE FROM orders")


def test_keyed_results_spreadsheet_flow(spark, sf01):
    """The populate_spreadsheet flow end-to-end: register the emitted
    triple set as a view, run a SECTION-keyed validation corpus through
    the guarded runner, flatten with keyed_results into Annotated-Data-
    Dictionary key paths (ADD_SCILHS_100/query.py:166-215 semantics)."""
    from kgforge.pipeline import _triples

    _triples(spark, sf01).createOrReplaceTempView("triples_v")
    corpus = """
    SELECT 'Triples' AS SECTION, COUNT(*) AS `Total Count`,
           COUNT(DISTINCT subj) AS `Unique Subjects` FROM triples_v;
    SELECT 'Triples' AS SECTION, pred AS Pred, COUNT(*) AS Count,
           ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER (), 1) AS Percent
    FROM triples_v GROUP BY pred;
    """
    flat = sq.keyed_results(sq.run_queries(spark, corpus))
    assert int(flat["Triples.Total Count"]) > 0
    assert int(flat["Triples.Unique Subjects"]) > 0
    # wide rows fold the first data column's value into the path
    assert "Triples.Pred.hasLang.Count" in flat
    assert "Triples.Pred.hasSpan.Percent" in flat
    pcts = [
        float(v) for k, v in flat.items()
        if k.startswith("Triples.Pred.") and k.endswith(".Percent")
    ]
    assert abs(sum(pcts) - 100.0) < 1.0
