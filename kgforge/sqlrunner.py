"""Read-only SQL runner with a token whitelist — the analog of the
reference's validation harness (ADD_SCILHS_100/query.py:61-106), which
parses each statement and raises `ValueError: Illegal token ...` for
anything that could write (delete/insert/truncate/...). Here the corpus
is a set of registered Spark views and statements execute via
spark.sql; the safety property is identical: a statement either
read-onlys or raises before touching the engine.

>>> split_statements("select 1; -- trailing comment\\nselect 2")
['select 1', 'select 2']
>>> strip_comments("select 1 -- hi\\n/* block */ from t")
'select 1 \\n  from t'
>>> check_statement("select * from orders")
>>> check_statement("delete from orders")
Traceback (most recent call last):
...
ValueError: Illegal token in query: delete
>>> check_statement("with x as (select 1) select * from x")
>>> check_statement("insert into t select 1")
Traceback (most recent call last):
...
ValueError: Illegal token in query: insert
>>> check_statement("select 'insert' as word from t")  # strings are fine
"""

from __future__ import annotations

import re

ILLEGAL = {
    "insert", "update", "delete", "truncate", "drop", "alter", "create",
    "merge", "grant", "revoke", "set", "refresh", "call", "msck",
}
ALLOWED_FIRST = {"select", "with", "show", "describe", "explain", "values"}

_STRING = re.compile(r"'(?:[^']|'')*'")
_LINE_COMMENT = re.compile(r"--[^\n]*")
_BLOCK_COMMENT = re.compile(r"/\*.*?\*/", re.DOTALL)
_TOKEN = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def strip_comments(sql: str) -> str:
    sql = _BLOCK_COMMENT.sub(" ", sql)
    return _LINE_COMMENT.sub("", sql)


def split_statements(sql: str) -> list[str]:
    """Split on semicolons outside strings; drop empties."""
    cleaned = strip_comments(sql)
    # blank out string literals so ';' inside them doesn't split
    masked = _STRING.sub(lambda m: " " * len(m.group(0)), cleaned)
    out, start = [], 0
    for i, ch in enumerate(masked):
        if ch == ";":
            stmt = cleaned[start:i].strip()
            if stmt:
                out.append(stmt)
            start = i + 1
    tail = cleaned[start:].strip()
    if tail:
        out.append(tail)
    return out


def check_statement(stmt: str) -> None:
    """Raise ValueError on any statement that is not read-only."""
    cleaned = strip_comments(stmt)
    masked = _STRING.sub(" ", cleaned)
    tokens = [t.lower() for t in _TOKEN.findall(masked)]
    if not tokens:
        raise ValueError("Empty query")
    if tokens[0] not in ALLOWED_FIRST:
        raise ValueError(f"Illegal token in query: {tokens[0]}")
    for t in tokens:
        if t in ILLEGAL:
            raise ValueError(f"Illegal token in query: {t}")


def keyed_results(results: list[dict]) -> dict[str, str]:
    """Flatten result sets into the Annotated-Data-Dictionary key paths
    (the behavior of ADD_SCILHS_100/query.py:166-215, re-expressed):
    every row leads with a SECTION column; short rows (< 4 columns) key
    remaining columns as 'Section.Col'; wider rows fold the first data
    column's name AND value into the path ('Section.Col1.Val1.ColN').
    All values stringified — the spreadsheet cells are text.

    >>> keyed_results([{"columns": ["SECTION", "Unique PATIDs"],
    ...                 "rows": [{"SECTION": "Demographics",
    ...                           "Unique PATIDs": 726}]}])
    {'Demographics.Unique PATIDs': '726'}
    >>> r = keyed_results([{"columns": ["SECTION", "Sex", "Count", "Percent"],
    ...      "rows": [{"SECTION": "Demographics", "Sex": "F",
    ...                "Count": 377, "Percent": 52},
    ...               {"SECTION": "Demographics", "Sex": "M",
    ...                "Count": 346, "Percent": 48}]}])
    >>> r["Demographics.Sex.M.Count"], r["Demographics.Sex.F.Percent"]
    ('346', '52')
    >>> keyed_results([{"columns": ["nope"], "rows": [{"nope": 1}]}])
    Traceback (most recent call last):
    ...
    ValueError: first column must be SECTION, got 'nope'
    >>> keyed_results([{"columns": [], "rows": []}])
    Traceback (most recent call last):
    ...
    ValueError: first column must be SECTION, got None
    """
    out: dict[str, str] = {}
    for res in results:
        cols = res["columns"]
        if not cols or cols[0].upper() != "SECTION":
            got = cols[0] if cols else None
            raise ValueError(f"first column must be SECTION, got {got!r}")
        for row in res["rows"]:
            section = str(row[cols[0]])
            if len(cols) < 4:
                start = 1
            else:
                section = ".".join([section, cols[1], str(row[cols[1]])])
                start = 2
            for c in cols[start:]:
                out[".".join([section, c])] = str(row[c])
    return out


def run_queries(spark, sql_text: str, limit: int | None = None) -> list[dict]:
    """Validate then run every statement; returns a list of
    {sql, columns, rows} dicts (the populate_spreadsheet 'keyed results'
    shape, query.py:166-215)."""
    results = []
    for stmt in split_statements(sql_text):
        check_statement(stmt)
        df = spark.sql(stmt)
        if limit:
            df = df.limit(limit)
        rows = [r.asDict() for r in df.collect()]
        results.append({"sql": stmt, "columns": df.columns, "rows": rows})
    return results


def register_views(spark, sf_dir: str, tables: list[str] | None = None) -> None:
    from kgforge.sources import TPCH_TABLES, read_table

    for t in tables or TPCH_TABLES:
        read_table(spark, t, sf_dir).createOrReplaceTempView(t)
