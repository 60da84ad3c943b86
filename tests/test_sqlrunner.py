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
